"""Decoded-screenshot disk cache: inflate each PNG once, not once per epoch.

The reference re-decodes every screenshot in every epoch
(``/root/reference/datasets.py:96-97`` opens the PNG inside
``__getitem__``), and libpng inflate is >99% of this framework's host-side
cost (ROADMAP "input pipeline at scale": ~395 ms of decode per flagship
batch on one core vs 0.5 ms of page building). This cache stores each
decoded uint8 array on disk the first time a page is touched; later epochs
(and later runs over the same data) read it back with ``np.load(...,
mmap_mode="r")`` — a memcpy out of the OS page cache (~0.5 ms/page)
instead of an inflate (~50-100 ms/page) — analogous to ``tf.data``
snapshotting, but content-addressed per page.

Cost: one decoded copy on disk (4.9 MB/page at 1280² s2d4; ~38 GB for the
full 7,740-page dataset), which is why it is opt-in (``--decode_cache DIR``
or ``COVA_DECODE_CACHE``).

Staleness: an entry is valid iff its file mtime is >= the source PNG's
(make-style). Writes are atomic (tmp + ``os.replace``) so concurrent
pipelines (multi-host training on a shared FS, val/test pipelines of the
same run) can share a directory; the worst race is a double decode.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import numpy as np


class DecodeCache:
    """Per-page cache of decoded screenshots under ``cache_dir``.

    ``tag`` encodes everything that changes the decoded array — layout
    (``raw``/``s2d4``) and target size — so one directory can serve
    configs with different geometries side by side.
    """

    def __init__(self, cache_dir: str, tag: str):
        self.dir = cache_dir
        self.tag = tag
        os.makedirs(cache_dir, exist_ok=True)

    def _path(self, page_id: str) -> str:
        return os.path.join(self.dir, f"{page_id}.{self.tag}.npy")

    def get(self, page_id: str, src_path: str) -> Optional[np.ndarray]:
        """The cached decode as a read-only memmap, or None on miss/stale.

        The memmap defers IO to the consumer's copy into the batch buffer,
        so a hit costs one page-cache-speed memcpy and no Python-side read.
        """
        path = self._path(page_id)
        try:
            if os.path.getmtime(path) < os.path.getmtime(src_path):
                return None  # source PNG newer than the cache entry
            return np.load(path, mmap_mode="r")
        except (OSError, ValueError, EOFError):
            # Missing, unreadable, or corrupt/truncated entry (np.load
            # raises EOFError on a zero-length file) -> re-decode; put()
            # then replaces the bad entry.
            return None

    def put(self, page_id: str, arr: np.ndarray, src_path: str) -> None:
        """Atomically persist one decoded page (crash/concurrency safe).

        The entry's mtime is copied from the source (make-style, entry ==
        source passes the >= staleness check), so a source stamped by a
        clock-ahead host on a shared FS can't leave the entry perpetually
        "stale" and silently disable the cache.
        """
        fd, tmp = tempfile.mkstemp(
            dir=self.dir, suffix=f".{self.tag}.tmp"
        )
        try:
            with os.fdopen(fd, "wb") as f:
                np.save(f, arr)
            src_ns = os.stat(src_path).st_mtime_ns
            os.utime(tmp, ns=(src_ns, src_ns))
            os.replace(tmp, self._path(page_id))
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
