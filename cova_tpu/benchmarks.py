"""Throughput benchmarks: flagship train step, pages/sec/chip.

The reference publishes no speed numbers (SURVEY.md §6); the measured
PyTorch-CPU anchor lives in ``baseline_torch.json`` (produced by
``scripts/bench_torch_baseline.py``) and ``vs_baseline`` is computed against
it. Measurement notes:

  * steps are timed with the batch pre-staged on device: the metric is the
    compute path (train fwd+bwd+update), matching the baseline measurement;
  * through the remote-TPU tunnel ``block_until_ready`` does not actually
    block, so every timed window ends with a scalar fetch, and several
    windows are taken with the best kept (dispatch noise is additive).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _vs_baseline(pages_per_sec, baseline_file, img_height):
    """pages_per_sec over the measured torch-CPU anchor — None when the
    anchor is missing OR was measured at a different image geometry (a
    320px TPU number divided by the 1280px anchor would print a
    meaninglessly inflated multiple). Batch size need not match: both
    sides are per-page."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        baseline_file,
    )
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        base = json.load(f)
    if not base.get("value"):
        return None
    if base.get("geometry", {}).get("img") != img_height:
        return None
    return pages_per_sec / base["value"]


def run_train_bench(
    batch_size: int = 8,
    steps: int = 20,
    img_height: int = 1280,
    compute_dtype: str = "bfloat16",
    windows: int = 3,
    use_additional_feat: bool = False,
    backbone: str = "resnet18_stem",
    context_size: int = 12,
):
    import jax

    from .config import Config
    from .data.batching import bucket_batch, collate
    from .data.records import pad_page
    from .data.synthetic import synth_image, synth_record
    from .models.cova import build_model
    from .train.steps import create_train_state, train_step

    # CoVA++ datapoint (--use_additional_feat, the reference's best
    # published config, utils.py:23-25): 4 synthetic features, matching
    # the CLI's synthetic path.
    n_af = 4 if use_additional_feat else 0
    cfg = Config(
        batch_size=batch_size,
        img_height=img_height,
        compute_dtype=compute_dtype,
        use_additional_feat=use_additional_feat,
        n_additional_feat=n_af,
        backbone=backbone,
        context_size=context_size,
    )
    model = build_model(cfg)

    imgs, pages = [], []
    for i in range(batch_size):
        rng = np.random.default_rng((7, i))
        rec = synth_record(str(i), img_height, rng, min_boxes=60,
                           max_boxes=min(120, cfg.max_boxes),
                           n_additional_feat=n_af)
        imgs.append(synth_image(rec, img_height, rng))
        pages.append(pad_page(rec, cfg.pad_boxes, cfg.context_size,
                              n_additional_feat=n_af))
    # The trainer slices this box mix (60-120/page, matching the real
    # data's mean 93) to its padding bucket before dispatch — measure the
    # step the product actually runs. The torch-CPU anchor is ragged
    # (zero padding), so bucketing moves the comparison closer to like-
    # for-like, not further.
    batch = jax.device_put(
        bucket_batch(collate(imgs, pages), cfg.box_buckets)
    )

    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    rng_step = jax.random.PRNGKey(1)

    import jax.numpy as jnp

    # Run `steps` optimizer steps inside one jit (fori_loop) so the
    # measurement is device time, not per-dispatch tunnel latency; a scalar
    # fetch at the end forces the sync.
    @jax.jit
    def run_steps(state, batch, rng):
        def body(i, s):
            s2, _ = train_step(s, batch, jax.random.fold_in(rng, i))
            return s2
        s = jax.lax.fori_loop(0, steps, body, state)
        return jnp.sum(
            s.params["decoder_out"]["Dense_0"]["bias"].astype(jnp.float32)
        )

    # Compile + warm — through the VMEM compile-OOM fallback (shrink
    # kernel budgets and re-trace at unanchored geometries, like the
    # trainer). The tunnel also occasionally throws a transient INTERNAL
    # error on the first dispatch — retry in-process a couple of times
    # before the caller escalates to a fresh-interpreter retry (bench.py).
    from .ops.vmem_fallback import with_vmem_fallback

    for attempt in range(3):
        try:
            _ = with_vmem_fallback(
                lambda: float(run_steps(state, batch, rng_step))
            )
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(3)
    best_dt = float("inf")
    for _ in range(windows):
        t0 = time.time()
        _ = float(run_steps(state, batch, rng_step))
        best_dt = min(best_dt, (time.time() - t0) / steps)

    pages_per_sec = batch_size / best_dt

    vs_baseline = _vs_baseline(
        pages_per_sec, "baseline_torch.json", img_height
    )

    return {
        "metric": "train_webpages_per_sec_per_chip",
        "value": round(pages_per_sec, 2),
        "unit": "pages/s",
        "vs_baseline": (
            round(vs_baseline, 1) if vs_baseline is not None else None
        ),
        "step_ms": round(best_dt * 1000, 2),
        "batch_size": batch_size,
        "img_height": img_height,
        "compute_dtype": compute_dtype,
        "use_additional_feat": use_additional_feat,
        "backbone": backbone,
        "context_size": context_size,
        "device": str(jax.devices()[0]),
    }


def run_e2e_bench(
    batch_size: int = 8,
    n_pages: int = 64,
    epochs: int = 3,
    img_height: int = 1280,
    compute_dtype: str = "bfloat16",
    num_threads: int = 0,
    source: str = "mem",
    use_additional_feat: bool = False,
):
    """END-TO-END-FED training throughput: batches flow from the real host
    pipeline (``DataPipeline``, BG sampling + context build + padded
    collation) through ``device_prefetch`` into the jitted train step — the
    number a user's training run actually sustains on this host, as opposed
    to ``run_train_bench``'s device-staged compute-path ceiling (VERDICT r2
    weak #4). Reports both next to each other.

    ``source``: ``mem`` feeds from an in-memory synthetic dataset (host cost
    = page building + collate); ``disk`` materializes real PNGs/CSVs in the
    reference layout and feeds through the native decode path WITH the
    decoded-screenshot cache — the timed epochs are cache-warm, i.e. the
    steady state of a real multi-epoch training run (epoch 1 is the
    warmup/compile epoch either way).
    """
    import jax

    from .config import Config
    from .data.batching import bucket_batch, pad_batch
    from .data.device_prefetch import device_prefetch
    from .data.pipeline import DataPipeline
    from .data.synthetic import InMemoryWebDataset
    from .models.cova import build_model
    from .ops.vmem_fallback import with_vmem_fallback
    from .train.steps import create_train_state, train_step

    n_af = 4 if use_additional_feat else 0
    cfg = Config(
        batch_size=batch_size,
        img_height=img_height,
        compute_dtype=compute_dtype,
        use_additional_feat=use_additional_feat,
        n_additional_feat=n_af,
    )
    threads = num_threads or min(8, os.cpu_count() or 1)
    tmpdir = None
    if source == "disk":
        import tempfile

        from .data.dataset import WebDataset
        from .data.synthetic import materialize

        tmpdir = tempfile.TemporaryDirectory(prefix="cova_e2e_disk_")
        ids = materialize(
            f"{tmpdir.name}/data", n_pages, img_height, seed=7,
            min_boxes=11, max_boxes=cfg.max_boxes,
            n_additional_feat=n_af,
        )
        ds = WebDataset(
            f"{tmpdir.name}/data", ids, use_additional_feat,
            img_size=img_height,
            decode_cache_dir=f"{tmpdir.name}/cache",
        )
    else:
        ds = InMemoryWebDataset(
            n_pages, img_height, seed=7, max_boxes=cfg.max_boxes,
            n_additional_feat=n_af,
        )
    pipe = DataPipeline(
        ds,
        batch_size=batch_size,
        pad_boxes=cfg.pad_boxes,
        context_size=cfg.context_size,
        shuffle=True,
        sampling_fraction=cfg.sampling_fraction,
        seed=cfg.seed,
        num_threads=threads,
    )
    model = build_model(cfg)
    _, example = next(iter(pipe.epoch(0)))
    example, _ = pad_batch(example, batch_size)
    state = create_train_state(model, cfg, example, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    # Bucket shapes whose train_step has compiled. As in the trainer, the
    # VMEM compile-OOM fallback wraps the FIRST dispatch of every new
    # shape (compile errors surface before buffer donation, so the
    # per-step retry is safe; retrying a whole epoch would not be — the
    # captured state's buffers are donated by earlier steps).
    compiled_shapes: set = set()

    def one_epoch(state, rng, epoch):
        # Mirror the trainer's dispatch exactly: pad to the static batch,
        # then slice the box dim to the padding bucket.
        padded = (
            (ids, bucket_batch(pad_batch(b, batch_size)[0],
                               cfg.box_buckets))
            for ids, b in pipe.epoch(epoch=epoch)
        )
        m = None
        for _, batch in device_prefetch(padded, size=2):
            rng, step_rng = jax.random.split(rng)
            shape_key = batch.boxes.shape[1]
            if shape_key not in compiled_shapes:
                compiled_shapes.add(shape_key)
                state, m = with_vmem_fallback(
                    lambda b=batch, r=step_rng: train_step(state, b, r)
                )
            else:
                state, m = train_step(state, batch, step_rng)
        float(m["loss_sum"])  # sync: epoch ends when the device is done
        return state, rng

    try:
        state, rng = one_epoch(state, rng, 0)  # compile + warm
        # Pre-compile EVERY bucket shape the trainer could dispatch: a
        # bucket can first appear in any epoch (it depends on the batch's
        # sampled max box count), and one stray compile inside the timed
        # window — measured 69-2211 s through the remote tunnel — would
        # corrupt the number.
        from .data.batching import _slice_boxes

        p_full = example.boxes.shape[1]
        for t in sorted(
            {b for b in cfg.box_buckets if b < p_full} | {p_full}
        ):
            warm = _slice_boxes(example, t) if t < p_full else example
            compiled_shapes.add(warm.boxes.shape[1])
            state, _ = with_vmem_fallback(
                lambda w=warm: train_step(
                    state, jax.device_put(w), jax.random.PRNGKey(2)
                )
            )
        t0 = time.time()
        for e in range(1, epochs + 1):
            state, rng = one_epoch(state, rng, e)
        dt = (time.time() - t0) / epochs
        e2e_pages_per_sec = n_pages / dt
    finally:
        # Crash paths must not leak the materialized dataset (~300 MB of
        # PNGs + decode cache under /tmp for the disk source).
        if tmpdir is not None:
            tmpdir.cleanup()
    compute = run_train_bench(
        batch_size=batch_size,
        img_height=img_height,
        compute_dtype=compute_dtype,
        use_additional_feat=use_additional_feat,
    )
    return {
        "metric": "e2e_train_webpages_per_sec",
        "value": round(e2e_pages_per_sec, 2),
        "unit": "pages/s",
        "source": source,
        "use_additional_feat": use_additional_feat,
        "epoch_seconds": round(dt, 2),
        "host_threads": threads,
        "compute_pages_per_sec": compute["value"],
        "compute_step_ms": compute["step_ms"],
        "batch_size": batch_size,
        "img_height": img_height,
        "compute_dtype": compute_dtype,
        "device": compute["device"],
    }


def run_infer_bench(
    batch_size: int = 32,
    steps: int = 20,
    img_height: int = 1280,
    compute_dtype: str = "bfloat16",
    windows: int = 3,
    use_additional_feat: bool = False,
    backbone: str = "resnet18_stem",
    context_size: int = 12,
):
    """Serving throughput: forward-only (eval mode, running BN stats),
    logits for every box on the page — the deployment path of ``cova
    eval`` / attention extraction, measured the same way as the train
    bench (device-staged batch, fori-loop, scalar fetch)."""
    import jax
    import jax.numpy as jnp

    from .config import Config
    from .data.batching import bucket_batch, collate
    from .data.records import pad_page
    from .data.synthetic import synth_image, synth_record
    from .models.cova import build_model
    from .train.steps import create_train_state

    # CoVA++ serving datapoint: same 4 synthetic features as the train
    # bench / CLI synthetic path.
    n_af = 4 if use_additional_feat else 0
    cfg = Config(
        batch_size=batch_size,
        img_height=img_height,
        compute_dtype=compute_dtype,
        use_additional_feat=use_additional_feat,
        n_additional_feat=n_af,
        backbone=backbone,
        context_size=context_size,
    )
    model = build_model(cfg)
    imgs, pages = [], []
    for i in range(batch_size):
        rng = np.random.default_rng((11, i))
        rec = synth_record(str(i), img_height, rng, min_boxes=60,
                           max_boxes=min(120, cfg.max_boxes),
                           n_additional_feat=n_af)
        imgs.append(synth_image(rec, img_height, rng))
        pages.append(pad_page(rec, cfg.pad_boxes, cfg.context_size,
                              n_additional_feat=n_af))
    # The product eval path buckets the box dim (run_eval) — serve the
    # same shapes it dispatches.
    batch = jax.device_put(
        bucket_batch(collate(imgs, pages), cfg.box_buckets)
    )
    # Forward-only: model.init, not create_train_state — the optimizer's
    # Adam moments are two extra param-sized trees of HBM a serving bench
    # never reads.
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch.images),
        jnp.asarray(batch.boxes),
        jnp.asarray(batch.box_mask),
        jnp.asarray(batch.context_indices),
        jnp.asarray(batch.additional_feats)
        if batch.additional_feats.shape[-1] > 0
        else None,
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    @jax.jit
    def run_steps(params, batch_stats, batch):
        def body(i, acc):
            # Data dependence on the carry defeats loop-invariant hoisting
            # of the whole forward (uint8 add of a zero).
            imgs = batch.images + (acc * 0).astype(batch.images.dtype)
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs,
                batch.boxes,
                batch.box_mask,
                batch.context_indices,
                batch.additional_feats if n_af else None,
                train=False,
            )
            return acc + (
                jnp.sum(out.logits[0, 0].astype(jnp.float32)) * 1e-12
            )
        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    from .ops.vmem_fallback import with_vmem_fallback

    for attempt in range(3):
        try:
            _ = with_vmem_fallback(
                lambda: float(
                    run_steps(params, batch_stats, batch)
                )
            )
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(3)
    best_dt = float("inf")
    for _ in range(windows):
        t0 = time.time()
        _ = float(run_steps(params, batch_stats, batch))
        best_dt = min(best_dt, (time.time() - t0) / steps)

    pages_per_sec = batch_size / best_dt
    vs_baseline = _vs_baseline(
        pages_per_sec, "baseline_torch_infer.json", img_height
    )

    return {
        "metric": "infer_webpages_per_sec_per_chip",
        "value": round(pages_per_sec, 2),
        "unit": "pages/s",
        "vs_baseline": (
            round(vs_baseline, 1) if vs_baseline is not None else None
        ),
        "step_ms": round(best_dt * 1000, 2),
        "batch_size": batch_size,
        "img_height": img_height,
        "compute_dtype": compute_dtype,
        "use_additional_feat": use_additional_feat,
        "backbone": backbone,
        "context_size": context_size,
        "device": str(jax.devices()[0]),
    }
