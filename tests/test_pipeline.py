"""Host input pipeline: shapes, determinism, sharding, disk round-trip."""

import numpy as np
import pytest

from cova_tpu.data.batching import pad_batch
from cova_tpu.data.dataset import WebDataset
from cova_tpu.data.pipeline import DataPipeline
from cova_tpu.data.synthetic import InMemoryWebDataset, materialize


@pytest.fixture(scope="module")
def mem_ds():
    return InMemoryWebDataset(
        n_pages=9, img_h=32, seed=1, min_boxes=5, max_boxes=12
    )


def _pipe(ds, **kw):
    args = dict(
        batch_size=4, pad_boxes=16, context_size=3, seed=0, num_threads=2
    )
    args.update(kw)
    return DataPipeline(ds, **args)


def test_shapes_and_masks(mem_ds):
    p = _pipe(mem_ds)
    ids, batch = next(iter(p.epoch(0)))
    assert batch.images.shape == (4, 8, 8, 48)  # host s2d(4)
    assert batch.images.dtype == np.uint8
    assert batch.boxes.shape == (4, 16, 4)
    assert batch.context_indices.shape == (4, 16, 6)
    assert batch.box_mask.sum(axis=1).min() >= 5
    assert len(ids) == 4


def test_partial_last_batch_and_padding(mem_ds):
    p = _pipe(mem_ds)
    batches = list(p.epoch(0))
    assert len(batches) == 3  # 9 pages / 4
    last_ids, last = batches[-1]
    assert last.batch_size == 1
    padded, page_mask = pad_batch(last, 4)
    assert padded.batch_size == 4
    assert page_mask.tolist() == [True, False, False, False]
    assert not padded.box_mask[1:].any()
    # Padded slots cycle REAL pages (not zeros): the backbone's image-level
    # BN sees natural statistics; only box_mask marks them invalid.
    for k in range(1, 4):
        np.testing.assert_array_equal(padded.images[k], padded.images[0])
        np.testing.assert_array_equal(padded.boxes[k], padded.boxes[0])


def test_epoch_determinism_and_reshuffle(mem_ds):
    p = _pipe(mem_ds, shuffle=True, sampling_fraction=0.7)
    ids_a = [i for ids, _ in p.epoch(3) for i in ids]
    ids_b = [i for ids, _ in p.epoch(3) for i in ids]
    ids_c = [i for ids, _ in p.epoch(4) for i in ids]
    assert ids_a == ids_b  # same epoch -> same order and sampling
    assert ids_a != ids_c  # different epoch -> reshuffled

    batch_a = next(iter(p.epoch(3)))[1]
    batch_b = next(iter(p.epoch(3)))[1]
    np.testing.assert_array_equal(batch_a.box_mask, batch_b.box_mask)
    np.testing.assert_array_equal(batch_a.boxes, batch_b.boxes)


def test_host_sharding(mem_ds):
    shards = []
    for idx in range(3):
        p = _pipe(mem_ds, shard_index=idx, shard_count=3)
        shards.append([i for ids, _ in p.epoch(0) for i in ids])
    flat = sorted(sum(shards, []))
    assert flat == sorted(mem_ds.ids)  # disjoint cover
    assert all(len(s) == 3 for s in shards)


def test_disk_roundtrip(tmp_path):
    root = str(tmp_path)
    ids = materialize(root, 5, 32, seed=2, min_boxes=4, max_boxes=9)
    ds = WebDataset(root, ids)
    p = _pipe(ds, batch_size=2)
    seen = 0
    for ids_b, batch in p.epoch(0):
        assert batch.images.shape[1:] == (8, 8, 48)
        seen += batch.batch_size
    assert seen == 5


def test_val_pipeline_never_samples(mem_ds):
    p1 = _pipe(mem_ds, sampling_fraction=1.0)
    n1 = next(iter(p1.epoch(0)))[1].box_mask.sum()
    n2 = next(iter(p1.epoch(5)))[1].box_mask.sum()
    assert n1 == n2


def test_producer_errors_propagate(mem_ds):
    """Decode/IO failures in the background producer must surface in the
    consumer, not hang the queue."""

    class Broken(type(mem_ds)):
        pass

    broken = Broken.__new__(Broken)
    broken.__dict__.update(mem_ds.__dict__)
    broken.image = lambda i: (_ for _ in ()).throw(IOError("boom"))
    p = _pipe(broken)
    with pytest.raises(IOError):
        list(p.epoch(0))


def test_global_batch_max_counts_multihost():
    """Every host computes the SAME per-batch global max box count with no
    communication, and it equals the max actually materialized across the
    stripes — the invariant that lets multi-host training keep padding
    buckets (divergent per-host buckets would deadlock collectives)."""
    from cova_tpu.data.batching import bucket_batch

    ds = InMemoryWebDataset(
        n_pages=11, img_h=16, seed=3, min_boxes=4, max_boxes=30
    )
    pipes = [
        DataPipeline(
            ds, batch_size=2, pad_boxes=32, context_size=2,
            shuffle=True, sampling_fraction=0.9, seed=7,
            num_threads=2, shard_index=i, shard_count=2,
        )
        for i in range(2)
    ]
    c0 = pipes[0].global_batch_max_counts(epoch=1)
    c1 = pipes[1].global_batch_max_counts(epoch=1)
    np.testing.assert_array_equal(c0, c1)

    # Materialize both stripes: 11 pages equalize to 12 -> 6/host ->
    # 3 local batches/host == 3 global batches.
    batches = [list(p.epoch(epoch=1)) for p in pipes]
    assert len(batches[0]) == len(batches[1]) == len(c0) == 3
    buckets = (8, 16, 24, 32)
    saw_divergent_local_max = False
    for b, ((_, b0), (_, b1)) in enumerate(zip(*batches)):
        local = [int(x.box_mask.sum(axis=1).max()) for x in (b0, b1)]
        assert max(local) == int(c0[b])
        saw_divergent_local_max |= local[0] != local[1]
        dims = {
            bucket_batch(x, buckets, lower_bound=int(c0[b])).boxes.shape[1]
            for x in (b0, b1)
        }
        assert len(dims) == 1, "hosts picked different buckets"
    # The fixture's seeds were chosen so at least one batch has different
    # per-host local maxima — otherwise the lower_bound does no work here.
    assert saw_divergent_local_max
