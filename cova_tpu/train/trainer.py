"""Training loop: epochs, periodic eval, early stopping, best-checkpoint.

Rebuilds ``train_model`` / ``evaluate_model``
(``/root/reference/train.py:9-171``) over the padded pipeline + jitted steps:

  * epoch log line, eval cadence (``epoch == 1 or epoch % interval == 0 or
    epoch == n_epochs``, ``train.py:72``), early stopping with patience 7 on
    the mean non-BG val class accuracy (``train.py:29-89``), and
    restore-best-at-end (``train.py:93-95``) all match the reference;
  * metrics accumulate as device scalars and are fetched once per epoch (no
    per-step host syncs);
  * checkpoints carry optimizer state for true resume (the reference saves
    params only).
"""

from __future__ import annotations

import os
import time
from typing import List, Optional, Tuple

import jax
import numpy as np

from ..data.batching import bucket_batch, bucket_batches, pad_batch
from ..data.device_prefetch import device_prefetch
from ..ops.vmem_fallback import with_vmem_fallback
from ..utils.checkpoint import (
    CheckpointManager,
    restore_train_state,
    save_train_state,
)
from ..utils.logging import MetricsLogger, print_and_log
from .steps import TrainState, eval_chunk_step, train_step


def default_eval_chunk() -> int:
    """Backend-aware default for ``COVA_EVAL_CHUNK`` (measured, VERDICT r2
    item 9 / ``scripts/measure_eval_chunk.py``).

    Chunking G eval batches per jitted dispatch trades dispatch round-trips
    (expensive through the remote-TPU tunnel) for host-side restacking of G
    whole uint8 batches (pure overhead where dispatch is cheap). Measured
    full-epoch wall-clock, 40 synthetic pages:

      * CPU backend (local, cheap dispatch), 320px: chunk=1 15.3 s vs
        chunk=8 27.7 s — chunking LOSES 1.8x; and every np.stack copy is
        pure overhead.
      * TPU via the remote tunnel, 1280px flagship: round 2 measured
        chunk=8 winning (the ~8x dispatch-count cut dominated); the
        round-4 re-measurement flipped — chunk=1 4.65 s vs chunk=8
        8.38 s (artifacts/tpu_r4/eval_chunk.out): restacking + one big
        host->tunnel serialization now costs more than the saved
        round-trips.

    So: 1 everywhere as of round 4. The chunked path stays (G>1 via
    ``COVA_EVAL_CHUNK``) for high-RTT links where round-trips dominate.
    """
    env = os.environ.get("COVA_EVAL_CHUNK")
    if env is not None:
        return max(1, int(env))
    return 1


def run_eval(
    state: TrainState,
    pipeline,
    n_classes: int,
    class_names,
    split_name: str = "VAL",
    log_file: Optional[str] = None,
    k: int = 1,
    sharding=None,
    box_buckets: Tuple[int, ...] = (),
) -> Tuple[np.ndarray, np.ndarray]:
    """Evaluate one split. Returns (img_acc [n_imgs, n_classes] int32 with
    img_id in column 0, class_acc [n_classes] percentages) — the reference
    ``evaluate_model`` contract (``train.py:99-171``).

    ``k``: retrieval depth — class-c correct iff the true class-c box is
    among the top-k boxes by class-c logit (reference ``train.py:144-153``;
    the reference default and every published number is k=1).

    ``sharding``: optional placement for eval batches when the state lives
    on a mesh (see ``parallel.mesh.eval_batch_sharding``).

    The epoch runs in CHUNKS of ``COVA_EVAL_CHUNK`` batches per jitted
    dispatch (``eval_chunk_step``): the reference dispatches one kernel
    launch per 10-page batch (``train.py:115-129``); here the per-dispatch
    round-trip amortizes over the chunk, and correctness fetches happen
    lazily, bounded at ``PENDING_CAP`` in-flight chunks. The default chunk
    is 1 everywhere (``default_eval_chunk``; measured flip in round 4 —
    artifacts/tpu_r4/eval_chunk.out — chunk=1 4.65 s vs chunk=8 8.38 s on
    the flagship config).
    """
    start = time.time()
    eval_bs = pipeline.batch_size
    # When the state lives on a mesh, pad each eval batch up to the next
    # data-degree multiple so the batch dim shards instead of replicating
    # (padded pages are masked — free relative to every chip redoing the
    # whole forward; reference-fixed eval bs=10 never divides dp=8).
    pad_bs = eval_bs
    if sharding is not None and sharding.spec and sharding.spec[0] is not None:
        dp = sharding.mesh.shape[sharding.spec[0]]
        pad_bs = -(-eval_bs // dp) * dp
    chunk = default_eval_chunk()
    rows: List[List[int]] = []
    pending = []  # ([(ids, b)], device correctness [G,B,C-1]) — fetch lazily
    chunk_sharding = None
    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        chunk_sharding = NamedSharding(
            sharding.mesh, PartitionSpec(None, *sharding.spec)
        )
    multiprocess = jax.process_count() > 1

    # Each flush leaves ONE device array pending ([G, B, C-1] bools — tiny,
    # ~30 bytes at chunk=1/bs=10). Lazy fetching keeps dispatch pipelined
    # through the tunnel, but an unbounded epoch would accumulate one live
    # device buffer per chunk; cap the in-flight count — draining the
    # OLDEST chunk is free, it finished long ago.
    PENDING_CAP = 64

    def drain(group, correct):
        if isinstance(correct, jax.Array) and not correct.is_fully_addressable:
            # Multi-host mesh with eval_batch_size % dp == 0: the chunk
            # output stays batch-sharded across hosts; np.asarray cannot
            # read non-addressable shards — gather the global value first
            # (tiny: [G, B, C-1] bools).
            from jax.experimental import multihost_utils

            correct = multihost_utils.process_allgather(correct, tiled=True)
        c_np = np.asarray(correct).astype(np.int32)  # [G, B, C-1]
        for g, (ids, b) in enumerate(group):
            for i, page_id in enumerate(ids[:b]):
                rows.append([int(page_id)] + list(c_np[g, i]))

    def flush(buf):
        if not buf:
            return
        # Slice the chunk's box dim to its padding bucket (one static
        # shape per chunk; semantics-preserving — sliced rows are masked
        # padding). Safe under multi-process too: every host reads the
        # full deterministic eval split, so the bucket choice agrees.
        group = bucket_batches(
            [batch for _, _, batch in buf], box_buckets
        )
        while len(group) < chunk:  # pad to the static chunk shape
            group.append(group[-1])
        if chunk == 1:
            # x[None] is a view — chunk=1 (the CPU default) adds no host
            # copy over dispatching the batch directly.
            stacked = jax.tree.map(lambda x: x[None], group[0])
        else:
            stacked = jax.tree.map(lambda *xs: np.stack(xs), *group)
        if chunk_sharding is not None:
            if multiprocess:
                # Every host reads the full (deterministic) eval split, so
                # the stacked chunk is identical across hosts — place it as
                # one global array (device_put cannot reach non-addressable
                # devices).
                from ..parallel.distributed import full_batch_to_global

                stacked = full_batch_to_global(stacked, chunk_sharding)
            else:
                stacked = jax.tree.map(
                    lambda x: jax.device_put(x, chunk_sharding), stacked
                )
        correct = with_vmem_fallback(
            lambda: eval_chunk_step(state, stacked, n_classes=n_classes, k=k)
        )
        pending.append(([(ids, b) for ids, b, _ in buf], correct))
        if len(pending) > PENDING_CAP:
            drain(*pending.pop(0))

    buf = []
    for ids, batch in pipeline.epoch(epoch=0):
        b = batch.batch_size
        batch, _ = pad_batch(batch, pad_bs)
        buf.append((ids, b, batch))
        if len(buf) == chunk:
            flush(buf)
            buf = []
    flush(buf)

    for group, correct in pending:
        drain(group, correct)
    if not rows:
        raise ValueError(
            f"{split_name} split is empty — check the fold dir / split "
            "files (evaluating zero pages has no defined accuracy)"
        )
    img_acc = np.array(rows, dtype=np.int32)
    class_acc = np.zeros(n_classes)
    class_acc[1:] = img_acc[:, 1:].mean(0) * 100

    print_and_log(
        "[%s] Avg_class_Accuracy: %.2f%% (%.2fs)"
        % (split_name, class_acc[1:].mean(), time.time() - start),
        log_file,
    )
    for c in range(1, n_classes):
        print_and_log(
            "%s top-%d-Acc: %.2f%%" % (class_names[c], k, class_acc[c]),
            log_file,
        )
    print_and_log("", log_file)
    return img_acc, class_acc


def fit(
    state: TrainState,
    cfg,
    train_pipeline,
    val_pipeline,
    ckpt: CheckpointManager,
    log_file: Optional[str] = None,
    metrics: Optional[MetricsLogger] = None,
    class_names=("BG", "Price", "Title", "Image"),
    resume: bool = False,
    mesh=None,
    on_rss_limit=None,
) -> Tuple[TrainState, float]:
    """Train with early stopping; returns (best-restored state, best val acc).

    ``mesh``: optional (data, model) ``jax.sharding.Mesh``. When given, the
    state is placed per ``parallel.mesh.state_shardings`` and every batch is
    sharded over the data axis; the jitted ``train_step`` is unchanged — XLA
    inserts the gradient psums from the shardings, and the CE-sum loss keeps
    its global-batch gradient scale (the sum runs over the whole sharded
    batch inside one XLA program).

    ``on_rss_limit``: optional ``callback(epoch)`` fired at an epoch
    boundary when host RSS crosses ``utils.rss.rss_limit_gb()`` — the
    remote-tunnel transfer path retains ~payload bytes per dispatch in
    host RSS (measured: ``utils/rss.py`` docstring), so long corpus runs
    must recycle the process. The callback runs right AFTER the epoch's
    "last" checkpoint is saved, so a callback that re-execs the same
    command with ``--resume`` (``cli.cmd_train`` wires this) continues
    the exact stream. A callback that returns lets training continue
    (warn-only mode).
    """
    metrics = metrics or MetricsLogger(None)
    best_eval_acc = 0.0
    patience_count = 0
    start_epoch = 1

    if resume and ckpt.exists("last"):
        extra_t = {
            "epoch": np.zeros((), np.int32),
            "best_eval_acc": np.zeros((), np.float64),
            "patience": np.zeros((), np.int32),
        }
        state, extra = restore_train_state(ckpt, "last", state, extra_t)
        start_epoch = int(extra["epoch"]) + 1
        best_eval_acc = float(extra["best_eval_acc"])
        patience_count = int(extra["patience"])
        print_and_log(
            f"Resuming from epoch {start_epoch} "
            f"(best val {best_eval_acc:.2f})",
            log_file,
        )

    # Mesh placement happens after any resume restore (restore returns host
    # arrays; sharding them here covers both paths).
    train_sharding = None
    val_sharding = None
    train_place = None
    if mesh is not None:
        from ..parallel.mesh import (
            batch_sharding,
            eval_batch_sharding,
            shard_train_state,
        )

        state = shard_train_state(state, mesh)
        train_sharding = batch_sharding(mesh)
        val_sharding = eval_batch_sharding(mesh, val_pipeline.batch_size)
        if jax.process_count() > 1:
            # Multi-host: each host's pipeline yields its per-host stripe
            # (batch_size/hosts pages); assemble the global data-sharded
            # batch from the stripes. The jitted step is unchanged.
            from ..parallel.distributed import local_batch_to_global

            def train_place(batch):  # noqa: F811
                return local_batch_to_global(batch, train_sharding)

    # Profiling hook (reference has only wall-clock epoch lines,
    # train.py:32,62-71): set COVA_PROFILE_DIR to capture a jax.profiler
    # trace of the first training steps for xprof/tensorboard.
    profile_dir = os.environ.get("COVA_PROFILE_DIR")
    profiling = False

    print("Training Model for %d epochs..." % cfg.n_epochs)
    stop = False
    # Box-dim shapes whose train_step has already compiled. Each padding
    # bucket is its own XLA program, and a bucket can first appear in ANY
    # epoch (it depends on the batch's sampled max box count), so the
    # VMEM compile-OOM fallback must wrap the first dispatch of every
    # NEW shape — not just the first dispatch overall.
    compiled_shapes: set = set()
    for epoch in range(start_epoch, cfg.n_epochs + 1):
        # Per-epoch dropout stream keyed by (seed, epoch), not by a key
        # chain threaded across epochs: a --resume run then continues the
        # exact stream the uninterrupted run would have used (the old
        # chain restarted at PRNGKey(seed), replaying epoch 1's masks).
        rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch)
        if profile_dir and epoch == start_epoch:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        start = time.time()
        step_metrics = []
        # Pad to the pipeline's LOCAL batch size (== cfg.batch_size single-
        # host; cfg.batch_size / process_count per host on a pod). Then
        # slice the box dim to the batch's padding bucket. Under multi-host
        # every host must pick the SAME bucket per step (divergent buckets
        # = divergent XLA programs = deadlocked collectives); the GLOBAL
        # batch's max box count is computable on every host with zero
        # communication, so each step buckets to that.
        local_bs = train_pipeline.batch_size
        buckets = tuple(cfg.box_buckets)
        global_max = (
            train_pipeline.global_batch_max_counts(epoch)
            if buckets and jax.process_count() > 1
            else None
        )
        padded = (
            (
                ids,
                bucket_batch(
                    pad_batch(b, local_bs)[0],
                    buckets,
                    lower_bound=(
                        int(global_max[i]) if global_max is not None else 0
                    ),
                ),
            )
            for i, (ids, b) in enumerate(train_pipeline.epoch(epoch=epoch))
        )
        for _, batch in device_prefetch(padded, size=2,
                                        sharding=train_sharding,
                                        place=train_place):
            rng, step_rng = jax.random.split(rng)
            shape_key = batch.boxes.shape[1]
            if shape_key not in compiled_shapes:
                # First dispatch at this bucket shape compiles a fresh
                # program; recover from a VMEM compile OOM at unanchored
                # geometries by shrinking the kernel budgets and
                # re-tracing (ops.vmem_fallback). Compile errors surface
                # before any buffer donation, so retrying is safe.
                compiled_shapes.add(shape_key)
                state, m = with_vmem_fallback(
                    lambda: train_step(state, batch, step_rng)
                )
            else:
                state, m = train_step(state, batch, step_rng)
            step_metrics.append(m)

        if profiling:
            jax.profiler.stop_trace()
            profiling = False
        # One host sync per epoch.
        step_metrics = jax.device_get(step_metrics)
        loss_sum = float(sum(m["loss_sum"] for m in step_metrics))
        n_correct = float(sum(m["n_correct"] for m in step_metrics))
        n_boxes = float(sum(m["n_boxes"] for m in step_metrics))
        epoch_secs = time.time() - start
        print_and_log(
            "Epoch: %2d  Loss: %.4f  Accuracy: %.2f%%  (%.2fs)"
            % (epoch, loss_sum / n_boxes, 100 * n_correct / n_boxes,
               epoch_secs),
            log_file,
        )
        metrics.log(
            "train_epoch",
            epoch=epoch,
            loss=loss_sum / n_boxes,
            acc=n_correct / n_boxes,
            seconds=epoch_secs,
            pages_per_sec=len(train_pipeline.ds) / epoch_secs,
        )

        if (
            epoch == 1
            or epoch % cfg.eval_interval == 0
            or epoch == cfg.n_epochs
        ):
            _, class_acc = run_eval(
                state, val_pipeline, cfg.n_classes, class_names, "VAL",
                log_file, sharding=val_sharding,
                box_buckets=tuple(cfg.box_buckets),
            )
            eval_acc = float(class_acc[1:].mean())
            metrics.log("val", epoch=epoch, avg_class_acc=eval_acc)
            if eval_acc > best_eval_acc:
                best_eval_acc = eval_acc
                patience_count = 0
                save_train_state(
                    ckpt, "best", state,
                    {"epoch": np.int32(epoch),
                     "best_eval_acc": np.float64(best_eval_acc),
                     "patience": np.int32(patience_count)},
                )
            else:
                patience_count += 1
                if patience_count >= cfg.patience:
                    print("Early Stopping!")
                    stop = True

        save_train_state(
            ckpt, "last", state,
            {"epoch": np.int32(epoch),
             "best_eval_acc": np.float64(best_eval_acc),
             "patience": np.int32(patience_count)},
        )
        if stop:
            break
        if on_rss_limit is not None and epoch < cfg.n_epochs:
            from ..utils import rss

            if rss.over_limit():
                print_and_log(
                    "[rss-watchdog] host RSS %.1f GB > limit %.1f GB after "
                    "epoch %d — recycling the process (resume continues "
                    "the exact stream from the just-saved checkpoint)"
                    % (rss.rss_gb(), rss.rss_limit_gb(), epoch),
                    log_file,
                )
                on_rss_limit(epoch)

    print("Model Trained! Restoring model to best Eval performance checkpoint...")
    if ckpt.exists("best"):
        state, _ = restore_train_state(ckpt, "best", state)
        # restore returns host numpy: re-place once (mesh shardings, or a
        # committed single-device copy) so the following test eval doesn't
        # re-upload the whole params tree on every chunk dispatch.
        if mesh is not None:
            from ..parallel.mesh import shard_train_state

            state = shard_train_state(state, mesh)
        else:
            state = jax.device_put(state)
    else:
        # Degenerate case: val accuracy never exceeded 0.0, so no "best" was
        # written (the reference would NameError here, train.py:83-86). Save
        # the final state so downstream eval/visualize always have a model.
        save_train_state(
            ckpt, "best", state,
            {"epoch": np.int32(cfg.n_epochs),
             "best_eval_acc": np.float64(best_eval_acc),
             "patience": np.int32(patience_count)},
        )
    return state, best_eval_acc
