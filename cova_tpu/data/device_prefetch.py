"""Device prefetch: overlap host->device batch transfer with compute.

The training loop consumes (ids, Batch) tuples; this wrapper keeps the next
batch's transfer in flight while the current step computes (JAX transfers
are async — ``jax.device_put`` returns immediately and the arrays
materialize on-device in the background). On hosts where the PCIe/tunnel
transfer is slow relative to the step, this hides most of it.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator

import jax


def device_prefetch(
    iterator: Iterable, size: int = 2, sharding=None, place=None
) -> Iterator:
    """Yield items with their array leaves already moving to device.

    iterator yields (ids, Batch); arrays are device_put (optionally with a
    sharding for the mesh path) up to ``size`` items ahead. ``place``
    overrides the placement entirely (multi-host: assemble the local stripe
    into a global array, ``parallel.distributed.local_batch_to_global``).
    """
    queue: deque = deque()

    def put(item):
        ids, batch = item
        if place is not None:
            batch = place(batch)
        elif sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.device_put(x, sharding), batch
            )
        else:
            batch = jax.tree.map(jax.device_put, batch)
        queue.append((ids, batch))

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out
