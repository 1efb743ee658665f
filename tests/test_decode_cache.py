"""Decoded-screenshot disk cache (data/decode_cache.py).

The cache must be a pure performance feature: identical images/batches with
it on, off, cold, and warm; stale entries (source PNG newer) re-decode.
"""

import glob
import os
import time

import numpy as np

from cova_tpu.data.dataset import WebDataset
from cova_tpu.data.pipeline import DataPipeline
from cova_tpu.data.synthetic import materialize


def _entries(cache_dir):
    """Cache entry paths (entries live under a per-dataset-root subdir)."""
    return sorted(glob.glob(os.path.join(cache_dir, "*", "*.npy")))


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
    assert len(_entries(cache)) == len(ids)


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
    assert len(_entries(cache)) == 1


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


def test_corrupt_entry_redecodes(tmp_path):
    """A zero-length cache entry (np.load raises EOFError) must fall back
    to decode and be replaced, not crash the pipeline forever."""
    data, ids = _mk_data(tmp_path, n=1)
    cache = str(tmp_path / "cache")
    ds = WebDataset(data, ids, img_size=32, decode_cache_dir=cache)
    want = ds.image(0)
    entry = _entries(cache)[0]
    open(entry, "w").close()  # truncate to zero bytes
    future = time.time() + 5
    os.utime(entry, (future, future))  # staleness check passes
    got = ds.image(0)
    np.testing.assert_array_equal(got, want)
    assert os.path.getsize(entry) > 0  # bad entry replaced


def test_entry_mtime_copied_from_source(tmp_path):
    """Entries stamp the SOURCE's mtime (make-style), so a clock-ahead
    writer host on a shared FS can't leave entries perpetually stale."""
    data, ids = _mk_data(tmp_path, n=1)
    cache = str(tmp_path / "cache")
    ds = WebDataset(data, ids, img_size=32, decode_cache_dir=cache)
    future = time.time() + 3600  # source PNG from a clock-ahead host
    os.utime(ds.img_paths[0], (future, future))
    ds.image(0)
    entry = _entries(cache)[0]
    assert os.stat(entry).st_mtime_ns == os.stat(
        ds.img_paths[0]
    ).st_mtime_ns
    # And the entry is a hit, not perpetually stale.
    assert ds._raw_cache.get(ids[0], ds.img_paths[0]) is not None


def test_pil_and_native_paths_share_geometry_and_tag(tmp_path):
    """The PIL fallback now pads/crops to img_size exactly like the native
    decoder (dataset._pad_crop mirrors cova_native.cpp:26-27), so model
    inputs don't depend on whether libcova_native is built — same pixels,
    same size-keyed cache tag."""
    from cova_tpu.data import native_loader

    data, ids = _mk_data(tmp_path, n=1)
    cache = str(tmp_path / "cache")
    pil_ds = WebDataset(data, ids, img_size=48, use_native=False,
                        decode_cache_dir=cache)
    img_pil = pil_ds.image(0)
    assert img_pil.shape == (48, 48, 3)  # padded/cropped from 32px source
    entries = _entries(cache)
    assert len(entries) == 1
    assert os.path.basename(entries[0]) == f"{ids[0]}.raw-48.npy"
    if native_loader.available():
        nat_ds = WebDataset(data, ids, img_size=48, use_native=True)
        np.testing.assert_array_equal(img_pil, nat_ds.image(0))


def test_shared_cache_dir_isolates_datasets(tmp_path):
    """Two datasets with colliding page ids sharing one cache dir (the
    COVA_DECODE_CACHE global-dir pattern) must never serve each other's
    pixels — entries are scoped per dataset root."""
    data_a = str(tmp_path / "a")
    data_b = str(tmp_path / "b")
    ids_a = materialize(data_a, 1, 32, seed=1, min_boxes=4, max_boxes=8)
    ids_b = materialize(data_b, 1, 32, seed=9, min_boxes=4, max_boxes=8)
    assert ids_a == ids_b  # same page id in both datasets
    cache = str(tmp_path / "cache")
    ds_a = WebDataset(data_a, ids_a, img_size=32, decode_cache_dir=cache)
    ds_b = WebDataset(data_b, ids_b, img_size=32, decode_cache_dir=cache)
    img_a = ds_a.image(0)
    img_b = ds_b.image(0)  # must not hit A's entry
    assert not np.array_equal(img_a, img_b)
    np.testing.assert_array_equal(
        ds_b.image(0), WebDataset(data_b, ids_b, img_size=32).image(0)
    )
    assert len(_entries(cache)) == 2


def test_hit_returns_writable_array(tmp_path):
    """image() hits must behave like misses: a fresh writable array, not a
    read-only memmap view (in-place consumers would crash only on warm
    epochs otherwise)."""
    data, ids = _mk_data(tmp_path, n=1)
    ds = WebDataset(data, ids, img_size=32,
                    decode_cache_dir=str(tmp_path / "cache"))
    ds.image(0)  # populate
    hit = ds.image(0)
    hit[0, 0, 0] = 255  # must not raise
    assert not isinstance(hit, np.memmap)


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
    assert len(_entries(cache)) == len(ids)
    warm = batches(cds)
    for (rp, rb), (cp, cb), (wp, wb) in zip(ref, cold, warm):
        assert rp == cp == wp
        np.testing.assert_array_equal(rb.images, cb.images)
        np.testing.assert_array_equal(rb.images, wb.images)
        np.testing.assert_array_equal(rb.boxes, cb.boxes)
        np.testing.assert_array_equal(rb.boxes, wb.boxes)
