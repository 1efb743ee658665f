"""Host input pipeline: threaded decode + background prefetch.

TPU-first replacement for the reference's ``DataLoader(num_workers=...)``
fork-based workers (``/root/reference/datasets.py:224-258``): a thread pool
decodes PNGs (PIL releases the GIL in zlib/decode), batches are assembled into
padded arrays, and a bounded background queue keeps a couple of batches ready
so the accelerator never waits on the host. Sampling and shuffling use
explicit, per-(epoch, page) seeded numpy Generators — unlike the reference,
whose worker-process RNG for BG sampling is unseeded (``datasets.py:101-110``),
every epoch here is exactly reproducible.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .batching import Batch, collate
from .dataset import WebDataset
from .records import pad_page, sample_background


class DataPipeline:
    """Iterable over (page_ids, Batch) tuples for one split.

    Args:
      dataset: the on-disk dataset.
      batch_size: pages per batch (last batch may be smaller; the train loop
        pads it — see ``batching.pad_batch``).
      pad_boxes: static per-page box capacity.
      context_size: K (neighbors each side).
      shuffle: reshuffle page order each epoch (train only).
      sampling_fraction: BG subsampling (train only; val/test use 1.0, as the
        reference hardcodes at ``datasets.py:237,249``).
      seed: base seed; combined with epoch and page index for all draws.
      num_threads: decode threads.
      prefetch: number of ready batches to keep ahead.
      shard_index / shard_count: per-host sharding hook for multi-host
        training — each host reads a disjoint stripe of each epoch's order.
    """

    def __init__(
        self,
        dataset: WebDataset,
        batch_size: int,
        pad_boxes: int,
        context_size: int,
        shuffle: bool = False,
        sampling_fraction: float = 1.0,
        seed: int = 123,
        num_threads: int = 5,
        prefetch: int = 2,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.pad_boxes = pad_boxes
        self.context_size = context_size
        self.shuffle = shuffle
        self.sampling_fraction = sampling_fraction
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self._shard_order(np.arange(len(self.ds))))
        return (n + self.batch_size - 1) // self.batch_size

    def _equalize(self, order: np.ndarray) -> np.ndarray:
        """Round the order up to a shard_count multiple by cycling pages
        from the front (the same page-cycling rule ``pad_batch`` applies to
        the last partial batch): every host MUST see the same number of
        batches per epoch, or the sharded train step's collectives deadlock
        when one host runs an extra step."""
        if self.shard_count == 1:
            return order
        n = len(order)
        m = -(-n // self.shard_count) * self.shard_count
        if m != n:
            order = np.concatenate([order, order[: m - n]])
        return order

    def _shard_order(self, order: np.ndarray) -> np.ndarray:
        if self.shard_count == 1:
            return order
        return self._equalize(order)[self.shard_index :: self.shard_count]

    def _shuffled_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            order = rng.permutation(order)
        return order

    def _epoch_order(self, epoch: int) -> np.ndarray:
        return self._shard_order(self._shuffled_order(epoch))

    def _sampled_record(self, epoch: int, index: int):
        """The page's bbox record after BG subsampling — the exact record
        ``_make_page`` pads (RNG keyed by (seed, epoch, dataset index), so
        every host computes the same record)."""
        rec = self.ds.record(index)
        if self.sampling_fraction < 1.0:
            rng = np.random.default_rng((self.seed, epoch, index))
            rec = sample_background(rec, self.sampling_fraction, rng)
        return rec

    def global_batch_max_counts(self, epoch: int) -> np.ndarray:
        """Per-batch max post-sampling box count over the GLOBAL batch —
        computable on ANY host with zero communication.

        Everything that determines the global batches is keyed by
        host-independent values: the epoch shuffle by (seed, epoch), stripe
        equalization deterministically, BG sampling by (seed, epoch,
        dataset index). Host h's local batch b is
        ``stripe_h[b*L:(b+1)*L]`` with ``stripe_h = order_eq[h::S]``, so
        global batch b is the contiguous block
        ``order_eq[b*G:(b+1)*G]`` (G = batch_size * shard_count).

        Counting costs one ``sample_background`` per page per epoch on
        bbox arrays already in RAM (``WebDataset`` loads bboxes eagerly) —
        no image decode, microseconds per page. Used by the trainer to
        pick one padding bucket per step that every host agrees on
        (``batching.bucket_batch(lower_bound=...)``).
        """
        order = self._equalize(self._shuffled_order(epoch))
        counts = np.fromiter(
            (
                self._sampled_record(epoch, int(i)).n_boxes
                for i in order
            ),
            dtype=np.int64,
            count=len(order),
        )
        g = self.batch_size * self.shard_count
        n_batches = (len(order) + g - 1) // g
        return np.asarray(
            [counts[b * g : (b + 1) * g].max() for b in range(n_batches)],
            dtype=np.int64,
        )

    def _make_page(self, epoch: int, index: int):
        return pad_page(
            self._sampled_record(epoch, index),
            self.pad_boxes,
            self.context_size,
            self.ds.n_additional_feat,
        )

    def _make_example(self, epoch: int, index: int):
        page = self._make_page(epoch, index)
        img = self.ds.image(index)
        return img, page

    def epoch(self, epoch: Optional[int] = None) -> Iterator[
        Tuple[List[str], Batch]
    ]:
        """Yield batches for one epoch, with background prefetch."""
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        order = self._epoch_order(epoch)
        n_batches = (len(order) + self.batch_size - 1) // self.batch_size
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # When the C++ runtime is available and the dataset is disk-backed
        # with a known image size, whole batches decode through the libpng
        # pthread pool in one call (no Python in the decode loop).
        use_native_batch = (
            getattr(self.ds, "use_native", False)
            and getattr(self.ds, "img_size", None) is not None
            and hasattr(self.ds, "img_paths")
        )

        size = self.ds.img_size if use_native_batch else None
        s2d4 = bool(size) and size % 4 == 0
        # Decoded-screenshot cache (decode_cache.py), tagged by the layout
        # this path emits so raw and s2d4 entries never mix.
        decode_cache = (
            self.ds.decode_cache(
                f"{'s2d4' if s2d4 else 'raw'}-{size}"
            )
            if use_native_batch and hasattr(self.ds, "decode_cache")
            else None
        )

        def decode_batch(idxs):
            """uint8 [n, ...] images for idxs — cache hits memcpy'd from
            disk, misses decoded in ONE native pthread-pool call and then
            persisted for every later epoch/run."""
            from . import native_loader

            paths = [self.ds.img_paths[int(i)] for i in idxs]
            if decode_cache is None:
                return native_loader.decode_png_batch(
                    paths, size, size, nthreads=self.num_threads, s2d4=s2d4
                )
            hits, miss_pos = {}, []
            for pos, i in enumerate(idxs):
                m = decode_cache.get(self.ds.ids[int(i)], paths[pos])
                if m is None:
                    miss_pos.append(pos)
                else:
                    hits[pos] = m
            n = len(idxs)
            shape = (
                (n, size // 4, size // 4, 48) if s2d4 else (n, size, size, 3)
            )
            imgs = np.empty(shape, dtype=np.uint8)
            if miss_pos:
                dec = native_loader.decode_png_batch(
                    [paths[p] for p in miss_pos],
                    size,
                    size,
                    nthreads=self.num_threads,
                    s2d4=s2d4,
                )
                for k, pos in enumerate(miss_pos):
                    imgs[pos] = dec[k]
                    decode_cache.put(
                        self.ds.ids[int(idxs[pos])], dec[k], paths[pos]
                    )
            for pos, m in hits.items():
                imgs[pos] = m  # the memmap's only read: page-cache memcpy
            return imgs

        def make_native_batch(idxs, pool):
            # Page building (BG sampling, context windows, padding) runs on
            # the Python pool CONCURRENTLY with the C++ decode below:
            # Executor.map submits every task immediately, and
            # decode_png_batch releases the GIL inside the libpng pthread
            # pool, so both proceed in parallel on multi-core hosts.
            pages_iter = pool.map(
                lambda i: self._make_page(epoch, int(i)), idxs
            )
            imgs = decode_batch(idxs)
            return collate(imgs, list(pages_iter))  # ndarray: no re-stack

        def producer():
            with ThreadPoolExecutor(self.num_threads) as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idxs = order[
                        b * self.batch_size : (b + 1) * self.batch_size
                    ]
                    try:
                        if use_native_batch:
                            batch = make_native_batch(idxs, pool)
                            page_ids = [
                                self.ds.ids[int(i)] for i in idxs
                            ]
                        else:
                            examples = list(
                                pool.map(
                                    lambda i: self._make_example(
                                        epoch, int(i)
                                    ),
                                    idxs,
                                )
                            )
                            imgs = [e[0] for e in examples]
                            pages = [e[1] for e in examples]
                            batch = collate(imgs, pages)
                            page_ids = [p.page_id for p in pages]
                        q.put((page_ids, batch))
                    except BaseException as e:  # surface in consumer
                        q.put(e)
                        return
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit.
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.1)

    def __iter__(self):
        return self.epoch()


def make_pipelines(cfg, train_ds, val_ds, test_ds, host_shard=None):
    """Build the three split pipelines (reference ``load_data``,
    ``datasets.py:193-265``): train shuffles + subsamples BG; val/test use
    batch_size = cfg.eval_batch_size, no shuffle, no sampling.

    ``host_shard``: optional (shard_index, shard_count) from
    ``parallel.distributed.host_shard_args()``. With shard_count > 1 the
    TRAIN pipeline reads a disjoint per-host stripe of each epoch's order
    and yields local batches of ``cfg.batch_size // shard_count`` — the
    trainer assembles them into the global batch
    (``distributed.local_batch_to_global``), so the global batch stays
    ``cfg.batch_size`` pages and the CE-sum gradient scale is unchanged.
    Val/test stay unsharded: every host reads the full (deterministic)
    split so eval batches can be placed as identical global arrays.
    """
    pad = cfg.pad_boxes
    shard_index, shard_count = host_shard or (0, 1)
    if cfg.batch_size % shard_count != 0:
        raise ValueError(
            f"batch_size={cfg.batch_size} must be divisible by the host "
            f"count {shard_count} (each host feeds batch_size/hosts pages)"
        )
    train = DataPipeline(
        train_ds,
        batch_size=cfg.batch_size // shard_count,
        pad_boxes=pad,
        context_size=cfg.context_size,
        shuffle=True,
        sampling_fraction=cfg.sampling_fraction,
        seed=cfg.seed,
        num_threads=cfg.num_workers,
        shard_index=shard_index,
        shard_count=shard_count,
    )
    evals = [
        DataPipeline(
            ds,
            batch_size=cfg.eval_batch_size,
            pad_boxes=pad,
            context_size=cfg.context_size,
            shuffle=False,
            sampling_fraction=1.0,
            seed=cfg.seed,
            num_threads=cfg.num_workers,
        )
        for ds in (val_ds, test_ds)
    ]
    return train, evals[0], evals[1]
