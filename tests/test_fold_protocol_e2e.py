"""End-to-end through the reference's on-disk protocol: a synthetic dataset
materialized in the reference layout (imgs/*.png, bboxes/*.csv) plus a
split_dir (Fold-1 file lists, webpage_info.csv, test_domains.txt) drives
``cova train`` without --synthetic, exercising fold loading
(main.py:36-51), split disjointness asserts, and the domainwise/macro
accuracy reporting path (evaluate.py:47-78)."""

import os

import numpy as np
import pytest

from cova_tpu.cli import main
from cova_tpu.data.dataset import load_fold_ids
from cova_tpu.data.synthetic import materialize


@pytest.fixture(scope="module")
def protocol_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("proto")
    data_dir = str(root / "data")
    ids = materialize(data_dir, 15, 64, seed=11, min_boxes=6, max_boxes=14)

    # Three fake domains; test domains disjoint from train/val domains.
    domains = ["alpha.com", "beta.com", "gamma.com"]
    page_domain = {pid: domains[int(pid) % 3] for pid in ids}
    # Fold-1: gamma.com pages are the test split (cross-domain protocol).
    test_ids = [p for p in ids if page_domain[p] == "gamma.com"]
    rest = [p for p in ids if page_domain[p] != "gamma.com"]
    train_ids, val_ids = rest[:7], rest[7:]

    fold_dir = root / "splits" / "Fold-1"
    fold_dir.mkdir(parents=True)
    for name, id_list in [
        ("train_imgs.txt", train_ids),
        ("val_imgs.txt", val_ids),
        ("test_imgs.txt", test_ids),
    ]:
        (fold_dir / name).write_text("\n".join(id_list) + "\n")
    (fold_dir / "test_domains.txt").write_text("gamma.com\n")
    (fold_dir / "webpage_info.csv").write_text(
        "webpage_name,domain\n"
        + "\n".join(f"{p},{page_domain[p]}" for p in ids)
        + "\n"
    )
    (fold_dir / "train_domains.txt").write_text("alpha.com\nbeta.com\n")
    (fold_dir / "val_domains.txt").write_text("alpha.com\nbeta.com\n")
    return str(root), data_dir, test_ids


def test_load_fold_ids(protocol_tree):
    root, data_dir, test_ids = protocol_tree
    train, val, test, info, doms = load_fold_ids(
        os.path.join(root, "splits", "Fold-1")
    )
    assert sorted(test.tolist()) == sorted(test_ids)
    assert info.shape[1] == 2
    assert doms.tolist() == "gamma.com" or list(np.atleast_1d(doms)) == [
        "gamma.com"
    ]


def test_train_with_domainwise_reporting(protocol_tree):
    root, data_dir, test_ids = protocol_tree
    out = os.path.join(root, "results")
    rc = main([
        "train", "--data_dir", data_dir,
        "--split_dir", os.path.join(root, "splits"),
        "--output_dir", out, "-cvf", "1",
        "--img_height", "64", "-bs", "4", "-cs", "3", "-hd", "32",
        "-bbhd", "8", "-e", "1", "--compute_dtype", "float32", "-nw", "2",
    ])
    assert rc == 0
    rd = os.path.join(
        out,
        "lr-5e-04 batch-4 cs-3 hd-32 roi-3 bbhd-8 af-0 wd-1e-03 "
        "dp-0.2 sf-0.9",
    )
    # Domainwise CSV exists with the reference schema (evaluate.py:48-69).
    dom_path = os.path.join(rd, "Fold-1 test_acc_domainwise.csv")
    lines = open(dom_path).read().splitlines()
    assert lines[0] == "Domain,N_examples,Price,Title,Image"
    cells = lines[1].split(",")
    assert cells[0] == "gamma.com"
    assert int(cells[1]) == len(test_ids)
    # fold_wise row includes macro accuracies.
    fw = open(os.path.join(rd, "fold_wise_acc.csv")).read().splitlines()
    assert fw[1].startswith("1,")
    assert len(fw[1].split(",")) == 8
    # imgwise rows cover exactly the test pages.
    img = np.loadtxt(
        os.path.join(rd, "Fold-1 test_acc_imgwise.csv"),
        delimiter=",", skiprows=1,
    )
    img = np.atleast_2d(img)
    assert sorted(img[:, 0].astype(int).astype(str)) == sorted(test_ids)
