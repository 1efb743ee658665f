"""Corpus-clone tooling (scripts/make_corpus_clone.py +
scripts/corpus_oracle_summary.py, VERDICT r4 item 1): a tiny splits tree
drives clone synthesis in the reference on-disk layout and the per-fold
oracle-ceiling join over the verbatim test lists."""

import csv
import os
import runpy
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(REPO, "scripts", script),
                       run_name="__main__")
    except SystemExit as e:  # scripts sys.exit(main())
        assert (e.code or 0) == 0, f"{script} exited {e.code}"
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def tiny_clone(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    splits = root / "splits"
    fold1 = splits / "Fold-1"
    fold1.mkdir(parents=True)
    ids = [str(i) for i in range(1, 9)]
    (splits / "all_imgs.txt").write_text("\n".join(ids) + "\n")
    (fold1 / "test_imgs.txt").write_text("\n".join(ids[5:]) + "\n")
    out = str(root / "clone")
    _run("make_corpus_clone.py",
         ["--out", out, "--img_height", "128", "--splits", str(splits)])
    return out, str(splits), ids


def test_clone_layout_and_labels(tiny_clone):
    out, _, ids = tiny_clone
    for pid in ids:
        png = os.path.join(out, "imgs", f"{pid}.png")
        assert os.path.isfile(png)
        rows = np.loadtxt(os.path.join(out, "bboxes", f"{pid}.csv"),
                          delimiter=",", skiprows=1)
        # Exactly one instance of each non-BG class per page (README.md:17,
        # the property the retrieval metric relies on).
        labels = rows[:, 4].astype(int)
        for c in (1, 2, 3):
            assert (labels == c).sum() == 1
        # xywh within the canvas.
        assert (rows[:, 0] >= 0).all() and (rows[:, 1] >= 0).all()
        assert (rows[:, 0] + rows[:, 2] <= 128 + 1e-3).all()


def test_clone_rerun_is_reproducible(tiny_clone, tmp_path):
    out, splits, ids = tiny_clone
    out2 = str(tmp_path / "clone2")
    _run("make_corpus_clone.py",
         ["--out", out2, "--img_height", "128", "--splits", splits,
          "--no-oracle"])
    for pid in ids[:3]:
        a = open(os.path.join(out, "bboxes", f"{pid}.csv")).read()
        b = open(os.path.join(out2, "bboxes", f"{pid}.csv")).read()
        assert a == b  # keyed by (seed, page id), not iteration order


def test_oracle_sidecar_and_fold_summary(tiny_clone, capsys):
    out, splits, ids = tiny_clone
    with open(os.path.join(out, "corpus_oracle.csv")) as f:
        rows = list(csv.DictReader(f))
    assert [r["page_id"] for r in rows] == ids
    for r in rows:  # 0/1 indicator columns
        for k, v in r.items():
            if k != "page_id":
                assert v in ("0", "1")
    _run("corpus_oracle_summary.py",
         ["--clone", out, "--splits", splits, "--folds", "1"])
    got = capsys.readouterr().out
    assert "oracle latent" in got and "oracle visible" in got
    # Fold row uses exactly the 3 verbatim test ids.
    assert "   1       3  " in got
