"""The documented Python API surface (root __init__ docstring + README)
must actually import — regression test for the lazy re-exports."""


def test_root_api():
    from cova_tpu import CLASS_NAMES, Config, build_model  # noqa: F401

    assert CLASS_NAMES[0] == "BG"


def test_train_api():
    from cova_tpu.train import (  # noqa: F401
        evaluate,
        extract_attention,
        fit,
        predict_pages,
    )

    assert callable(fit) and callable(evaluate)


def test_data_api():
    from cova_tpu.data import (  # noqa: F401
        DataPipeline,
        WebDataset,
        make_pipelines,
    )

    assert hasattr(DataPipeline, "epoch")


def test_unknown_attr_raises():
    import pytest

    import cova_tpu.train as t

    with pytest.raises(AttributeError):
        t.nonexistent_symbol
