"""Benchmark harnesses run end-to-end on CPU at a tiny geometry and emit
well-formed metric dicts (the driver consumes bench.py's JSON line; the
serving bench backs `cova bench --mode infer`)."""

import json

from cova_tpu.benchmarks import (
    run_e2e_bench,
    run_infer_bench,
    run_train_bench,
)


def test_train_bench_smoke():
    r = run_train_bench(
        batch_size=2, steps=2, img_height=64,
        compute_dtype="float32", windows=1,
    )
    assert r["metric"] == "train_webpages_per_sec_per_chip"
    assert r["unit"] == "pages/s"
    assert r["value"] > 0
    assert r["step_ms"] > 0
    json.dumps(r)  # JSON-serializable for the driver line


def test_train_bench_additional_feat():
    """CoVA++ datapoint (--use_additional_feat): the bench must pad the
    4 synthetic features into the batch — regression for the r4 battery
    crash where pad_page was called without n_additional_feat and the
    model (n_additional_feat=4) received None."""
    r = run_train_bench(
        batch_size=2, steps=2, img_height=64,
        compute_dtype="float32", windows=1, use_additional_feat=True,
    )
    assert r["value"] > 0
    assert r["use_additional_feat"] is True
    json.dumps(r)


def test_infer_bench_additional_feat():
    """CoVA++ serving datapoint: `cova bench --mode infer
    --use_additional_feat` must build the 4-feature model and label the
    result JSON — before round 4 the CLI silently dropped the flag on the
    infer branch."""
    r = run_infer_bench(
        batch_size=2, steps=2, img_height=64,
        compute_dtype="float32", windows=1, use_additional_feat=True,
    )
    assert r["value"] > 0
    assert r["use_additional_feat"] is True
    json.dumps(r)


def test_infer_bench_smoke():
    r = run_infer_bench(
        batch_size=2, steps=2, img_height=64,
        compute_dtype="float32", windows=1,
    )
    assert r["metric"] == "infer_webpages_per_sec_per_chip"
    assert r["value"] > 0
    json.dumps(r)


def test_e2e_bench_disk_smoke():
    """The disk-fed e2e mode materializes the reference on-disk layout and
    feeds it through the native decode path + decoded-screenshot cache."""
    r = run_e2e_bench(
        batch_size=2, n_pages=6, epochs=1, img_height=64,
        compute_dtype="float32", source="disk",
    )
    assert r["metric"] == "e2e_train_webpages_per_sec"
    assert r["source"] == "disk"
    assert r["value"] > 0
    json.dumps(r)
