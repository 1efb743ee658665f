"""`cova sweep`: per-fold runs + the published mean ± std aggregation."""

import os

import numpy as np

from cova_tpu.cli import main, sweep_summary


def test_sweep_summary_last_row_per_fold_wins(tmp_path):
    p = str(tmp_path / "fold_wise_acc.csv")
    with open(p, "w") as f:
        f.write(
            "Fold,val_avg,price_acc,price_macro_acc,title_acc,"
            "title_macro_acc,image_acc,image_macro_acc\n"
            "1,90,10,11,12,13,14,15\n"
            "2,90,20,21,22,23,24,25\n"
            "1,90,30,31,32,33,34,35\n"  # re-run of fold 1: overrides row 1
        )
    s = sweep_summary(p, [1, 2])
    assert "folds: [1, 2]" in s
    # classwise Price = mean(30, 20) = 25.0, std = 5.0
    assert "Price 25.0 ± 5.0" in s
    # macro Image = mean(35, 25) = 30.0
    assert "Image 30.0 ± 5.0" in s
    # folds without rows are skipped, not NaN'd
    s13 = sweep_summary(p, [1, 3])
    assert "folds: [1]" in s13
    assert sweep_summary(p, [4]) is None


def test_sweep_hard_writes_oracle_band(tmp_path):
    """Hard-synthetic sweeps record the Bayes-oracle ceiling band next to
    the model scores (VERDICT r4 item 2): oracle_acc.csv per fold +
    'oracle latent/visible' lines in sweep_summary.txt."""
    out = str(tmp_path / "res")
    rc = main([
        "sweep", "--synthetic", "12", "--synthetic_hard",
        "--img_height", "64",
        "-bs", "4", "-cs", "3", "-hd", "32", "-bbhd", "8", "-e", "1",
        "--compute_dtype", "float32", "-nw", "2",
        "--output_dir", out, "--folds", "1",
    ])
    assert rc == 0
    rd = os.path.join(
        out,
        "lr-5e-04 batch-4 cs-3 hd-32 roi-3 bbhd-8 af-0 wd-1e-03 "
        "dp-0.2 sf-0.9",
    )
    orows = np.loadtxt(
        os.path.join(rd, "oracle_acc.csv"),
        delimiter=",", skiprows=1, ndmin=2,
    )
    assert orows.shape == (1, 7)
    assert int(orows[0, 0]) == 1
    assert np.all(orows[0, 1:] >= 0) and np.all(orows[0, 1:] <= 100)
    text = open(os.path.join(rd, "sweep_summary.txt")).read()
    assert "oracle latent:" in text and "oracle visible:" in text


def test_sweep_cli_writes_summary(tmp_path):
    out = str(tmp_path / "res")
    rc = main([
        "sweep", "--synthetic", "12", "--img_height", "64",
        "-bs", "4", "-cs", "3", "-hd", "32", "-bbhd", "8", "-e", "1",
        "--compute_dtype", "float32", "-nw", "2",
        "--output_dir", out, "--folds", "1", "2",
    ])
    assert rc == 0
    rd = os.path.join(
        out,
        "lr-5e-04 batch-4 cs-3 hd-32 roi-3 bbhd-8 af-0 wd-1e-03 "
        "dp-0.2 sf-0.9",
    )
    rows = np.loadtxt(
        os.path.join(rd, "fold_wise_acc.csv"),
        delimiter=",", skiprows=1, ndmin=2,
    )
    assert sorted(rows[:, 0].astype(int).tolist()) == [1, 2]
    text = open(os.path.join(rd, "sweep_summary.txt")).read()
    assert "classwise:" in text and "macro:" in text
    assert "±" in text
