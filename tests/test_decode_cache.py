"""Decoded-screenshot disk cache (data/decode_cache.py).

The cache must be a pure performance feature: identical images/batches with
it on, off, cold, and warm; stale entries (source PNG newer) re-decode.
"""

import os
import time

import numpy as np

from cova_tpu.data.dataset import WebDataset
from cova_tpu.data.pipeline import DataPipeline
from cova_tpu.data.synthetic import materialize


def _mk_data(tmp_path, n=5, img_h=32):
    data = str(tmp_path / "data")
    ids = materialize(data, n, img_h, seed=3, min_boxes=4, max_boxes=8)
    return data, ids


def test_image_cache_roundtrip(tmp_path):
    data, ids = _mk_data(tmp_path)
    cache = str(tmp_path / "cache")
    plain = WebDataset(data, ids, img_size=32)
    cached = WebDataset(data, ids, img_size=32, decode_cache_dir=cache)
    for i in range(len(ids)):
        cold = cached.image(i)  # decode + persist
        warm = cached.image(i)  # memmap hit
        np.testing.assert_array_equal(cold, plain.image(i))
        np.testing.assert_array_equal(warm, plain.image(i))
        assert warm.dtype == np.uint8
    assert len(os.listdir(cache)) == len(ids)


def test_cache_off_by_default(tmp_path, monkeypatch):
    monkeypatch.delenv("COVA_DECODE_CACHE", raising=False)
    data, ids = _mk_data(tmp_path, n=2)
    ds = WebDataset(data, ids, img_size=32)
    ds.image(0)
    assert ds.decode_cache_dir is None
    assert not (tmp_path / "cache").exists()


def test_env_var_enables_cache(tmp_path, monkeypatch):
    cache = str(tmp_path / "envcache")
    monkeypatch.setenv("COVA_DECODE_CACHE", cache)
    data, ids = _mk_data(tmp_path, n=2)
    ds = WebDataset(data, ids, img_size=32)
    ds.image(0)
    assert len(os.listdir(cache)) == 1


def test_stale_entry_redecodes(tmp_path):
    data, ids = _mk_data(tmp_path, n=1)
    cache = str(tmp_path / "cache")
    ds = WebDataset(data, ids, img_size=32, decode_cache_dir=cache)
    ds.image(0)
    # Rewrite the source PNG with different pixels, mtime strictly newer.
    from PIL import Image

    png = ds.img_paths[0]
    new = np.full((32, 32, 3), 77, np.uint8)
    Image.fromarray(new).save(png)
    future = time.time() + 5
    os.utime(png, (future, future))
    got = ds.image(0)
    np.testing.assert_array_equal(got, new)
    # And the refreshed entry serves the new content too.
    np.testing.assert_array_equal(ds.image(0), new)


def test_pipeline_batches_identical_cold_and_warm(tmp_path):
    """Batches must be bit-identical: uncached vs cache-cold vs cache-warm
    (exercises the native batch-decode path when the library is built, the
    PIL path otherwise)."""
    data, ids = _mk_data(tmp_path, n=6)
    cache = str(tmp_path / "cache")

    def batches(ds):
        pipe = DataPipeline(ds, batch_size=2, pad_boxes=8, context_size=2,
                            shuffle=False, num_threads=2)
        return [(pids, b) for pids, b in pipe.epoch(0)]

    ref = batches(WebDataset(data, ids, img_size=32))
    cds = WebDataset(data, ids, img_size=32, decode_cache_dir=cache)
    cold = batches(cds)
    assert len(os.listdir(cache)) == len(ids)
    warm = batches(cds)
    for (rp, rb), (cp, cb), (wp, wb) in zip(ref, cold, warm):
        assert rp == cp == wp
        np.testing.assert_array_equal(rb.images, cb.images)
        np.testing.assert_array_equal(rb.images, wb.images)
        np.testing.assert_array_equal(rb.boxes, cb.boxes)
        np.testing.assert_array_equal(rb.boxes, wb.boxes)
