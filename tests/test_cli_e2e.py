"""End-to-end CLI test: train -> artifacts -> visualize on synthetic data.

The integration analogue of running ``python main.py`` in the reference
(SURVEY.md §4(c)): a short training run must produce decreasing loss, every
reference artifact, restorable checkpoints, and attention CSVs.
"""

import os
import re

import numpy as np
import pytest

from cova_tpu.cli import main


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli_e2e"))
    rc = main([
        "train", "--synthetic", "16", "--img_height", "64",
        "-bs", "4", "-cs", "3", "-hd", "32", "-bbhd", "8", "-e", "2",
        "--compute_dtype", "float32", "--output_dir", out, "-nw", "2",
    ])
    assert rc == 0
    return out


def _results_dir(out):
    subdirs = [d for d in os.listdir(out) if d.startswith("lr-")]
    assert len(subdirs) == 1
    return os.path.join(out, subdirs[0])


def test_artifacts_exist(trained):
    rd = _results_dir(trained)
    for name in [
        "Fold-1 logs.txt",
        "Fold-1 test_acc_imgwise.csv",
        "fold_wise_acc.csv",
        "metrics.jsonl",
        "Fold-1 saved_model.orbax",
    ]:
        assert os.path.exists(os.path.join(rd, name)), name


def test_log_format_and_loss_decreases(trained):
    rd = _results_dir(trained)
    log = open(os.path.join(rd, "Fold-1 logs.txt")).read()
    losses = [
        float(m) for m in re.findall(r"Epoch:\s*\d+\s+Loss: ([\d.]+)", log)
    ]
    assert len(losses) == 2
    assert losses[1] < losses[0]
    assert "[VAL] Avg_class_Accuracy:" in log


def test_imgwise_csv_schema(trained):
    rd = _results_dir(trained)
    path = os.path.join(rd, "Fold-1 test_acc_imgwise.csv")
    header = open(path).readline().strip()
    assert header == "img_id,price_acc,title_acc,image_acc"
    rows = np.loadtxt(path, delimiter=",", skiprows=1)
    assert rows.shape[1] == 4  # 16 pages -> 4 test pages (20% split)


def test_fold_csv_schema(trained):
    rd = _results_dir(trained)
    lines = open(os.path.join(rd, "fold_wise_acc.csv")).read().splitlines()
    assert lines[0] == (
        "Fold,val_avg,price_acc,price_macro_acc,title_acc,"
        "title_macro_acc,image_acc,image_macro_acc"
    )
    assert lines[1].startswith("1,")


def test_visualize_from_checkpoint(trained):
    rc = main([
        "visualize", "--synthetic", "16", "--img_height", "64",
        "-bs", "4", "-cs", "3", "-hd", "32", "-bbhd", "8",
        "--compute_dtype", "float32", "--output_dir", trained,
        "-nw", "2", "--no_render", "--max_pages", "2",
    ])
    assert rc in (0, None)
    rd = _results_dir(trained)
    vis = os.path.join(rd, "Fold-1 attention visualization")
    csvs = [f for f in os.listdir(vis) if f.endswith(".csv")]
    assert len(csvs) == 2
    rows = np.loadtxt(os.path.join(vis, csvs[0]), delimiter=",")
    rows = np.atleast_2d(rows)
    # layout: 4 coords + label + 2K*4 context coords + 2K attention (K=3)
    assert rows.shape[1] == 4 + 1 + 6 * 4 + 6
    labels = rows[:, 4]
    assert set(labels).issubset({1.0, 2.0, 3.0})
    attn = rows[:, -6:]
    np.testing.assert_allclose(attn.sum(1), 1.0, atol=2e-3)


def test_visualize_renders_synthetic_overlays(trained):
    """Without --no_render, synthetic test images are materialized to a
    temp dir and the matplotlib overlay PNGs are produced (C21)."""
    rc = main([
        "visualize", "--synthetic", "16", "--img_height", "64",
        "-bs", "4", "-cs", "3", "-hd", "32", "-bbhd", "8",
        "--compute_dtype", "float32", "--output_dir", trained,
        "-nw", "2", "--max_pages", "1",
    ])
    assert rc in (0, None)
    rd = _results_dir(trained)
    vis = os.path.join(rd, "Fold-1 attention visualization")
    pngs = [f for f in os.listdir(vis) if f.endswith(".png")]
    # one PNG per non-BG class present on the page
    assert pngs, "no overlay PNGs rendered"
    assert all("_attn_" in f for f in pngs)


def test_eval_standalone(trained, tmp_path, monkeypatch):
    """`cova eval` rebuilds the model, restores the best checkpoint, and
    writes its artifacts to the CWD (reference evaluate.py:175-183)."""
    monkeypatch.chdir(tmp_path)
    rc = main([
        "eval", "--synthetic", "16", "--img_height", "64",
        "-bs", "4", "-cs", "3", "-hd", "32", "-bbhd", "8",
        "--compute_dtype", "float32", "--output_dir", trained, "-nw", "2",
    ])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "Fold-1 test_acc_imgwise.csv"))
    assert os.path.exists(str(tmp_path / "Fold-1 test_acc_classwise.txt"))


def test_cli_resume(trained):
    """--resume continues from the last checkpoint instead of restarting."""
    rc = main([
        "train", "--synthetic", "16", "--img_height", "64",
        "-bs", "4", "-cs", "3", "-hd", "32", "-bbhd", "8", "-e", "3",
        "--compute_dtype", "float32", "--output_dir", trained,
        "-nw", "2", "--resume",
    ])
    assert rc == 0
    rd = _results_dir(trained)
    log = open(os.path.join(rd, "Fold-1 logs.txt")).read()
    assert "Resuming from epoch 3" in log


def test_predict_standalone(trained, tmp_path):
    """`cova predict` writes one per-page CSV of box predictions +
    calibrated probabilities (the serving surface; train/predict.py)."""
    out = str(tmp_path / "preds")
    rc = main([
        "predict", "--synthetic", "16", "--img_height", "64",
        "-bs", "4", "-cs", "3", "-hd", "32", "-bbhd", "8",
        "--compute_dtype", "float32", "--output_dir", trained,
        "-nw", "2", "--out_dir", out, "--max_pages", "2",
    ])
    assert rc == 0
    csvs = sorted(
        f for f in os.listdir(out)
        if f.endswith(".csv") and f != "retrieval.csv"
    )
    assert len(csvs) == 2
    path = os.path.join(out, csvs[0])
    header = open(path).readline().strip()
    assert header == "x,y,w,h,pred,p_BG,p_Price,p_Title,p_Image"
    rows = np.atleast_2d(np.loadtxt(path, delimiter=",", skiprows=1))
    assert rows.shape[1] == 4 + 1 + 4
    probs = rows[:, 5:]
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-3)
    # pred is the argmax of the written distribution
    np.testing.assert_array_equal(rows[:, 4], probs.argmax(1))
    # boxes are the page's real (non-padding) boxes in x/y/w/h
    assert (rows[:, 2] > 0).all() and (rows[:, 3] > 0).all()
    # task-level retrieval artifact: one pick per (page, non-BG class),
    # the highest-scoring box of that class column (reference
    # train.py:144-153 ranking at k=1)
    ret = open(os.path.join(out, "retrieval.csv")).read().splitlines()
    assert ret[0] == "page_id,class,box_index,x,y,w,h,score"
    assert len(ret) == 1 + 2 * 3  # 2 pages x {Price, Title, Image}
    for line in ret[1:]:
        parts = line.split(",")
        assert parts[1] in {"Price", "Title", "Image"}
        assert 0 <= int(parts[2]) < 232
        assert 0.0 <= float(parts[7]) <= 1.0


def test_predict_page_ids_without_splits(trained, tmp_path):
    """--page_ids serves arbitrary on-disk pages with no splits/ tree and
    no fold datasets loaded (the deploy-box path)."""
    from cova_tpu.data.synthetic import materialize

    ds = str(tmp_path / "ds")
    materialize(ds, 2, 64, seed=11)
    out = str(tmp_path / "preds")
    rc = main([
        "predict", "--data_dir", ds, "--img_height", "64",
        "-bs", "4", "-cs", "3", "-hd", "32", "-bbhd", "8",
        "--compute_dtype", "float32", "--output_dir", trained,
        "-nw", "2", "--page_ids", "0", "1", "--out_dir", out,
        "--render",
    ])
    assert rc == 0
    assert sorted(os.listdir(out)) == [
        "0.csv", "0_pred.png", "1.csv", "1_pred.png", "retrieval.csv",
    ]
    rows = np.atleast_2d(
        np.loadtxt(os.path.join(out, "0.csv"), delimiter=",", skiprows=1)
    )
    assert rows.shape[1] == 9
    # pred column is written as an integer literal
    first = open(os.path.join(out, "0.csv")).readlines()[1].split(",")[4]
    assert first == str(int(first))


def test_resume_continues_exact_stream(tmp_path):
    """A 2-epoch run resumed to 3 must produce EXACTLY the uninterrupted
    3-epoch run's epoch-3 line: the dropout stream is keyed by
    (seed, epoch), not a chain that --resume would replay from epoch 1."""
    base = [
        "train", "--synthetic", "16", "--img_height", "64",
        "-bs", "4", "-cs", "3", "-hd", "32", "-bbhd", "8",
        "--compute_dtype", "float32", "-nw", "2",
    ]
    full = str(tmp_path / "full")
    assert main(base + ["-e", "3", "--output_dir", full]) == 0
    part = str(tmp_path / "part")
    assert main(base + ["-e", "2", "--output_dir", part]) == 0
    assert main(base + ["-e", "3", "--output_dir", part, "--resume"]) == 0

    def epoch_lines(out):
        rd = _results_dir(out)
        log = open(os.path.join(rd, "Fold-1 logs.txt")).read()
        return re.findall(r"Epoch:\s*3\s+Loss: [\d.]+\s+Accuracy: [\d.]+%",
                          log)

    (want,) = epoch_lines(full)
    got = epoch_lines(part)
    assert got and got[-1] == want
