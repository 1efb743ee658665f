"""``cova`` command-line interface: train / eval / visualize / sweep / bench.

Replaces the reference's three script entry points with one CLI while keeping
flag names, defaults, and artifact locations identical:

  * ``cova train``     == ``python main.py`` (``/root/reference/main.py``)
  * ``cova eval``      == ``python evaluate.py`` (``evaluate.py:87-209``)
  * ``cova visualize`` == ``python extract_attn_wts_and_visualize.py``
  * ``cova sweep``     == running main.py once per fold (README.md usage)
  * ``cova bench``     == throughput benchmark (new; SURVEY.md §7)

Flags mirror ``cmdline_args_parser`` (``utils.py:10-34``); the results
directory is keyed by the same hyperparameter string (``main.py:71-83``) so
checkpoints and CSVs land where a reference user expects.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

from .config import CLASS_NAMES, N_FOLDS, Config


def _add_common_flags(p: argparse.ArgumentParser):
    # Names/defaults from the reference CLI (utils.py:15-32).
    p.add_argument("-d", "--device", type=int, default=0,
                   help="unused on TPU (kept for flag parity)")
    p.add_argument("-e", "--n_epochs", type=int, default=50)
    p.add_argument("-lr", "--learning_rate", type=float, default=0.0005)
    p.add_argument("-bs", "--batch_size", type=int, default=5)
    p.add_argument("-cs", "--context_size", type=int, default=12)
    p.add_argument("-hd", "--hidden_dim", type=int, default=384)
    p.add_argument("-r", "--roi", type=int, default=3)
    p.add_argument("-bbhd", "--bbox_hidden_dim", type=int, default=32)
    p.add_argument("--use_additional_feat", dest="additional_feat",
                   action="store_true")
    p.add_argument("-wd", "--weight_decay", type=float, default=1e-3)
    p.add_argument("-dp", "--drop_prob", type=float, default=0.2)
    p.add_argument("-sf", "--sampling_fraction", type=float, default=0.9)
    p.add_argument("-nw", "--num_workers", type=int, default=5)
    p.add_argument("-cvf", "--cv_fold", type=int, default=1,
                   choices=[-1, *range(1, N_FOLDS + 1)])
    # New (TPU framework) flags:
    p.add_argument("--data_dir", default="../data")
    p.add_argument("--split_dir", default="splits")
    p.add_argument("--output_dir", default="results_5-Fold_CV")
    p.add_argument("--img_height", type=int, default=1280)
    p.add_argument("--backbone", default="resnet18_stem")
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--num_devices", type=int, default=1,
                   help="devices for the (data, model) mesh "
                        "(0 = all available, 1 = single-device)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel factor within num_devices "
                        "(wide decoder/GAT kernels)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the last checkpoint if present")
    p.add_argument("--init_checkpoint", default=None, metavar="PATH.pth",
                   help="torchvision ResNet state_dict (.pth) to initialize "
                        "the backbone from — the reference's "
                        "resnet18(pretrained=True) init (models.py:49-51); "
                        "this environment has no egress, so the user "
                        "supplies the file")
    p.add_argument("--synthetic", type=int, default=0, metavar="N_PAGES",
                   help="use N synthetic pages instead of data_dir "
                        "(smoke runs without the external dataset)")
    p.add_argument("--synthetic_hard", action="store_true",
                   help="harder synthetic task: color-matched distractor "
                        "boxes + noisy layout priors (non-saturating sweep "
                        "scores that make regressions visible)")
    p.add_argument("--decode_cache", default="", metavar="DIR",
                   help="decoded-screenshot disk cache: inflate each PNG "
                        "once, later epochs/runs memcpy from the OS page "
                        "cache (~4.9 MB/page at 1280^2; COVA_DECODE_CACHE "
                        "also enables it)")


def _cfg_from_args(args) -> Config:
    sf = args.sampling_fraction
    if not (0 <= sf <= 1):
        sf = 1.0  # reference clamping rule (main.py:65-69)
    return Config(
        data_dir=args.data_dir,
        split_dir=args.split_dir,
        output_dir=args.output_dir,
        img_height=args.img_height,
        context_size=args.context_size,
        sampling_fraction=sf,
        num_workers=args.num_workers,
        roi=args.roi,
        hidden_dim=args.hidden_dim,
        bbox_hidden_dim=args.bbox_hidden_dim,
        use_additional_feat=args.additional_feat,
        drop_prob=args.drop_prob,
        backbone=args.backbone,
        compute_dtype=args.compute_dtype,
        n_epochs=args.n_epochs,
        learning_rate=args.learning_rate,
        batch_size=args.batch_size,
        weight_decay=args.weight_decay,
        cv_fold=args.cv_fold,
        num_devices=args.num_devices,
        model_parallel=args.model_parallel,
        decode_cache=args.decode_cache,
    )


def _load_datasets(cfg: Config, args):
    """Returns (train_ds, val_ds, test_ds, webpage_info, test_domains)."""
    from .data.dataset import WebDataset, load_fold_ids
    from .data.synthetic import InMemoryWebDataset

    if args.synthetic:
        n = args.synthetic
        # Rotate the page order by fold so `cova sweep --synthetic` runs
        # genuinely different 60/20/20 splits per fold (mirroring the
        # reference's disjoint-fold protocol); fold 1 keeps the identity
        # order for backward compatibility.
        if not (cfg.cv_fold == -1 or 1 <= cfg.cv_fold <= N_FOLDS):
            raise ValueError(
                f"cv_fold must be -1 or 1..{N_FOLDS}, got {cfg.cv_fold}"
            )
        shift = ((cfg.cv_fold - 1) * n) // N_FOLDS if cfg.cv_fold > 0 else 0
        order = [(i + shift) % n for i in range(n)]
        splits = (
            order[0 : int(n * 0.6)],
            order[int(n * 0.6) : int(n * 0.8)],
            order[int(n * 0.8) : n],
        )
        base = InMemoryWebDataset(
            n, cfg.img_height, seed=cfg.seed, max_boxes=cfg.max_boxes,
            n_additional_feat=(
                4 if cfg.use_additional_feat else 0
            ),
            hard=getattr(args, "synthetic_hard", False),
        )

        # Synthesize a page->domain mapping (10 round-robin domains) so the
        # synthetic path exercises the full domainwise/macro reporting the
        # reference computes from webpage_info.csv (evaluate.py:48-78) —
        # without it, sweep artifacts would report macro accuracies of 0.
        import numpy as np

        domains = np.array([f"synth{i % 10:02d}.com" for i in range(n)])
        webpage_info = np.stack(
            [np.array(base.ids), domains], axis=1
        )
        test_domains = np.unique(domains[np.array(splits[2], np.int32)])
        return (*[base.subset(s) for s in splits], webpage_info, test_domains)

    train_ids, val_ids, test_ids, webpage_info, test_domains = load_fold_ids(
        cfg.fold_dir
    )
    # Build the native host runtime opportunistically (libpng decode + CSV
    # parse thread pool); WebDataset falls back to PIL/numpy without it.
    from .data import native_loader

    native_loader.ensure_built()
    mk = lambda ids: WebDataset(  # noqa: E731
        cfg.data_dir, ids, cfg.use_additional_feat, img_size=cfg.img_height,
        decode_cache_dir=cfg.decode_cache or None,
    )
    return mk(train_ids), mk(val_ids), mk(test_ids), webpage_info, test_domains


def _build(cfg: Config, train_ds, val_ds, test_ds):
    import jax

    from .data.batching import pad_batch
    from .data.pipeline import make_pipelines
    from .models.cova import build_model
    from .parallel import distributed
    from .train.steps import create_train_state

    if train_ds.n_additional_feat:
        cfg = cfg.replace(n_additional_feat=train_ds.n_additional_feat)
    # Multi-host: stripe the train pipeline per host (each host feeds
    # batch_size / process_count pages; the trainer assembles the global
    # batch). Single-process: (0, 1) no-op.
    host_shard = (
        distributed.host_shard_args()
        if distributed.is_multiprocess()
        else None
    )
    train_p, val_p, test_p = make_pipelines(
        cfg, train_ds, val_ds, test_ds, host_shard=host_shard
    )
    model = build_model(cfg)
    _, example = next(iter(val_p.epoch(0)))
    example, _ = pad_batch(example, cfg.eval_batch_size)
    state = create_train_state(model, cfg, example, jax.random.PRNGKey(cfg.seed))
    from .utils.params import count_parameters

    # Trainable-param line at init (reference models.py:92).
    print("Model Parameters:", count_parameters(state.params))
    return cfg, model, state, train_p, val_p, test_p


def cmd_train(args) -> int:
    from .train.reporting import append_fold_row, evaluate
    from .train.trainer import fit
    from .utils.checkpoint import CheckpointManager
    from .utils.logging import MetricsLogger, print_and_log

    cfg = _cfg_from_args(args)
    from .parallel import distributed

    if distributed.is_multiprocess() and cfg.num_devices == 1:
        # An N-process launch IS the multi-device intent; default to the
        # full global device set rather than silently training N separate
        # single-device copies on striped data.
        import jax

        print(
            f"Multi-host launch ({jax.process_count()} processes): "
            "using all global devices (--num_devices 0)"
        )
        cfg = cfg.replace(num_devices=0)
    train_ds, val_ds, test_ds, webpage_info, test_domains = _load_datasets(
        cfg, args
    )
    cfg, model, state, train_p, val_p, test_p = _build(
        cfg, train_ds, val_ds, test_ds
    )

    if getattr(args, "init_checkpoint", None):
        from .utils.pretrained import (
            BACKBONE_TO_WEIGHTS,
            PRETRAINED_REGISTRY,
            load_verified_backbone,
        )

        canonical = PRETRAINED_REGISTRY[
            BACKBONE_TO_WEIGHTS[cfg.backbone]
        ]["file"]
        is_canonical = (
            os.path.basename(args.init_checkpoint) == canonical
        )
        if not is_canonical:
            print(
                f"Note: {args.init_checkpoint} is not the canonical "
                f"{canonical}; loading without the sha256 pin "
                "(custom/fine-tuned checkpoint path)."
            )
        bp, bs = load_verified_backbone(
            cfg.backbone, args.init_checkpoint, verify=is_canonical
        )
        state = state.replace(
            params={**state.params, "convnet": bp},
            batch_stats={**state.batch_stats, "convnet": bs},
        )
        print(
            f"Initialized {cfg.backbone} backbone from "
            f"{args.init_checkpoint}"
        )

    os.makedirs(cfg.results_dir, exist_ok=True)
    log_file = cfg.log_file()
    print(f'\n{"*"*20} Training on Fold-{cfg.cv_fold} {"*"*20}')
    print(f'logs will be saved in "{log_file}"')
    # Hyperparameter header (main.py:110-119).
    print_and_log("Learning Rate: %.0e" % cfg.learning_rate, log_file, "w")
    print_and_log("Batch Size: %d" % cfg.batch_size, log_file)
    print_and_log("Context Size: %d" % cfg.context_size, log_file)
    print_and_log("Hidden Dim: %d" % cfg.gat_hidden_dim, log_file)
    print_and_log(
        "RoI Pool Output Size: (%d, %d)" % (cfg.roi, cfg.roi), log_file
    )
    print_and_log("BBox Hidden Dim: %d" % cfg.bbox_hidden_dim, log_file)
    print_and_log(
        "Use Additional Features: %s" % cfg.use_additional_feat, log_file
    )
    print_and_log("Weight Decay: %.0e" % cfg.weight_decay, log_file)
    print_and_log("Dropout Probability: %.2f" % cfg.drop_prob, log_file)
    print_and_log(
        "Sampling Fraction: %.2f\n" % cfg.sampling_fraction, log_file
    )

    # Multi-device: build the (data, model) mesh the trainer shards over
    # (None = plain single-device jit). SURVEY.md §2/§7 step 6.
    from .parallel.mesh import mesh_from_config

    mesh = mesh_from_config(cfg)
    if mesh is not None:
        print_and_log(
            "Mesh: %s" % dict(mesh.shape), log_file
        )

    ckpt = CheckpointManager(cfg.ckpt_dir())
    metrics = MetricsLogger(os.path.join(cfg.results_dir, "metrics.jsonl"))

    # RSS watchdog (utils/rss.py: the tunnel transfer path retains
    # ~payload bytes per dispatch in host RSS; corpus folds grow
    # ~4-5 GB/epoch). At an epoch boundary past the limit, re-exec this
    # exact command with --resume: "last" was just checkpointed and the
    # per-epoch fold_in streams make the resumed run bit-identical to an
    # uninterrupted one. Single-process only — on a pod every host would
    # have to recycle in lockstep, which needs an orchestrator, not exec.
    on_rss_limit = None
    if not distributed.is_multiprocess():

        def on_rss_limit(epoch):  # noqa: F811  (not reached in tests)
            argv = [sys.executable, "-m", "cova_tpu.cli"] + sys.argv[1:]
            if "--resume" not in argv:
                argv.append("--resume")
            sys.stdout.flush()
            sys.stderr.flush()
            os.execv(sys.executable, argv)

    state, val_acc = fit(
        state, cfg, train_p, val_p, ckpt, log_file, metrics,
        class_names=CLASS_NAMES, resume=args.resume, mesh=mesh,
        on_rss_limit=on_rss_limit,
    )

    imgwise = os.path.join(
        cfg.results_dir, f"Fold-{cfg.cv_fold} test_acc_imgwise.csv"
    )
    domainwise = os.path.join(
        cfg.results_dir, f"Fold-{cfg.cv_fold} test_acc_domainwise.csv"
    )
    class_acc, macro_acc = evaluate(
        state, test_p, cfg.n_classes, CLASS_NAMES, log_file, imgwise,
        webpage_info, test_domains, domainwise,
        box_buckets=cfg.box_buckets,
    )
    append_fold_row(
        os.path.join(cfg.results_dir, "fold_wise_acc.csv"),
        cfg.cv_fold, val_acc, class_acc, macro_acc,
    )
    if args.synthetic and getattr(args, "synthetic_hard", False):
        _append_oracle_row(cfg, test_ds, log_file)
    return 0


def _append_oracle_row(cfg, test_ds, log_file) -> None:
    """Hard-synthetic calibration (VERDICT r4 item 2): score this fold's
    test split with the generator's own Bayes rule and record the ceiling
    BAND next to the model's scores — 'latent' reads the assigned box
    colors (upper bound: what any model could reach with perfect
    observation), 'visible' re-estimates colors from the rendered pixels
    (a pixels-only decision rule; occlusion folds in, so it lower-bounds
    the pixel-Bayes ceiling). A model score inside the band is at the
    task ceiling; below the visible line it underfits."""
    from .data.synthetic import oracle_retrieval_correct
    from .utils.logging import _is_primary, print_and_log

    if not _is_primary():
        return
    lat = oracle_retrieval_correct(test_ds).mean(axis=0) * 100
    vis = oracle_retrieval_correct(test_ds, visible=True).mean(axis=0) * 100
    for name, acc in (("latent", lat), ("visible", vis)):
        print_and_log(
            "[ORACLE %s] Price: %.2f%% Title: %.2f%% Image: %.2f%%"
            % (name, acc[0], acc[1], acc[2]),
            log_file,
        )
    path = os.path.join(cfg.results_dir, "oracle_acc.csv")
    new = not os.path.isfile(path)
    with open(path, "a") as f:
        if new:
            f.write(
                "fold,price_latent,title_latent,image_latent,"
                "price_visible,title_visible,image_visible\n"
            )
        f.write(
            "%d,%.2f,%.2f,%.2f,%.2f,%.2f,%.2f\n"
            % (cfg.cv_fold, *lat, *vis)
        )


def _restore_best(cfg, state, torch_model=None):
    """Restore the fold's best orbax checkpoint — or, with ``torch_model``,
    serve a TRAINED REFERENCE checkpoint directly: the reference saves
    ``model.state_dict()`` (``/root/reference/train.py:84``), which
    ``port_cova_state_dict`` converts to our Flax trees (validated
    end-to-end to ~1e-3 in tests/test_torch_parity.py)."""
    if torch_model:
        import torch

        from .utils.torch_port import port_cova_state_dict

        sd = torch.load(torch_model, map_location="cpu")
        params, stats = port_cova_state_dict(
            sd,
            use_context=cfg.context_size > 0,
            bbox_hidden_dim=cfg.bbox_hidden_dim,
            n_additional_feat=cfg.n_additional_feat,
            roi=cfg.roi,
        )
        print(f"Serving ported reference checkpoint: {torch_model}")
        return state.replace(params=params, batch_stats=stats)
    from .utils.checkpoint import CheckpointManager, restore_train_state

    ckpt = CheckpointManager(cfg.ckpt_dir())
    assert ckpt.exists("best"), (
        "Model does not seem to have been trained (run `cova train`) with "
        "the hyperparameters you provided"
    )
    state, _ = restore_train_state(ckpt, "best", state)
    return state


def cmd_eval(args) -> int:
    from .train.reporting import evaluate

    cfg = _cfg_from_args(args)
    train_ds, val_ds, test_ds, webpage_info, test_domains = _load_datasets(
        cfg, args
    )
    cfg, model, state, _, _, test_p = _build(cfg, train_ds, val_ds, test_ds)
    state = _restore_best(
        cfg, state, torch_model=getattr(args, "torch_model", None)
    )
    # Standalone re-eval writes to CWD like the reference (evaluate.py:175-183)
    log_file = f"Fold-{cfg.cv_fold} test_acc_classwise.txt"
    class_acc, macro_acc = evaluate(
        state, test_p, cfg.n_classes, CLASS_NAMES, log_file,
        f"Fold-{cfg.cv_fold} test_acc_imgwise.csv",
        webpage_info, test_domains,
        f"Fold-{cfg.cv_fold} test_acc_domainwise.csv",
        k=getattr(args, "top_k", 1),
        box_buckets=cfg.box_buckets,
    )
    print("Class acc:", class_acc[1:], "Macro acc:", macro_acc[1:])
    return 0


def cmd_predict(args) -> int:
    """Standalone serving surface: per-box class predictions, one CSV per
    page (see ``train/predict.py``). Pages default to the fold's test
    split; ``--page_ids`` predicts arbitrary pages from ``--data_dir``
    (their bbox CSVs' label column is ignored — use 0 when unlabeled)."""
    import json

    from .train.predict import predict_pages

    cfg = _cfg_from_args(args)
    if args.page_ids:
        # Standalone serving path: load ONLY the requested pages — no
        # splits/ tree, no fold datasets (a deploy box has just imgs/ +
        # bboxes/ for the pages it serves). The model/state are built
        # from the predict pipeline's own first batch.
        if args.synthetic:
            raise SystemExit("--page_ids requires on-disk data, not "
                             "--synthetic (synthetic predicts its test split)")
        import jax

        from .data import native_loader
        from .data.batching import pad_batch
        from .data.dataset import WebDataset
        from .data.pipeline import DataPipeline
        from .models.cova import build_model
        from .train.steps import create_train_state

        native_loader.ensure_built()
        pred_ds = WebDataset(
            cfg.data_dir, args.page_ids, cfg.use_additional_feat,
            img_size=cfg.img_height,
            decode_cache_dir=cfg.decode_cache or None,
        )
        if pred_ds.n_additional_feat:
            cfg = cfg.replace(n_additional_feat=pred_ds.n_additional_feat)
        pipeline = DataPipeline(
            pred_ds, batch_size=cfg.eval_batch_size,
            pad_boxes=cfg.pad_boxes, context_size=cfg.context_size,
            shuffle=False, sampling_fraction=1.0, seed=cfg.seed,
            num_threads=cfg.num_workers,
        )
        model = build_model(cfg)
        _, example = next(iter(pipeline.epoch(0)))
        example, _ = pad_batch(example, cfg.eval_batch_size)
        state = create_train_state(
            model, cfg, example, jax.random.PRNGKey(cfg.seed)
        )
        state = _restore_best(
            cfg, state, torch_model=getattr(args, "torch_model", None)
        )
    else:
        train_ds, val_ds, test_ds, _, _ = _load_datasets(cfg, args)
        cfg, model, state, _, _, test_p = _build(
            cfg, train_ds, val_ds, test_ds
        )
        state = _restore_best(
            cfg, state, torch_model=getattr(args, "torch_model", None)
        )
        pipeline = test_p
    out_dir = args.out_dir or os.path.join(
        cfg.results_dir, f"Fold-{cfg.cv_fold} predictions"
    )
    img_dir = None
    if args.render:
        if args.synthetic:
            raise SystemExit(
                "--render needs on-disk screenshots (<data_dir>/imgs); "
                "synthetic pages have none"
            )
        img_dir = os.path.join(cfg.data_dir, "imgs")
    summary = predict_pages(
        state, pipeline, out_dir, CLASS_NAMES,
        max_pages=args.max_pages, box_buckets=cfg.box_buckets,
        img_dir=img_dir,
    )
    print(f"Predictions for {summary['pages']} pages saved in {out_dir}")
    print(json.dumps(summary))
    return 0


def cmd_export(args) -> int:
    """Export the fold's best trained checkpoint to the REFERENCE's torch
    format — the inverse of ``--torch_model`` serving. Writes a
    ``model.state_dict()``-style ``.pth`` (reference ``train.py:84``) to the
    exact path the reference's offline consumers look it up at
    (``evaluate.py:184`` / ``extract_attn_wts_and_visualize.py:61``:
    ``<results_dir>/Fold-<k> saved_model.pth``), so a model trained on TPU
    here drops straight into the reference repo's eval/visualize scripts."""
    import jax
    import numpy as np
    import torch

    from .data.batching import Batch
    from .models.cova import build_model
    from .train.steps import create_train_state
    from .utils.torch_port import export_cova_state_dict

    cfg = _cfg_from_args(args)
    if cfg.use_additional_feat and cfg.n_additional_feat == 0:
        # Normally discovered from data (datasets.py:78 semantics); export
        # has no dataset in hand, so take it from the flag (synthetic and
        # the reference's published CoVA++ both use 4).
        cfg = cfg.replace(n_additional_feat=args.n_feat)
    if cfg.backbone != "resnet18_stem":
        raise SystemExit(
            "export targets the reference architecture (models.py:48-56), "
            f"which uses the truncated resnet18 stem; got --backbone "
            f"{cfg.backbone}"
        )
    # Param shapes don't depend on image size — init on a tiny example
    # (cheap CPU trace) while keeping cfg for the results-dir key.
    shape_cfg = cfg.replace(img_height=64)
    P, K = shape_cfg.pad_boxes, 2 * cfg.context_size
    example = Batch(
        images=np.zeros((1, 64, 64, 3), np.uint8),
        boxes=np.tile(
            np.array([2.0, 2.0, 10.0, 10.0], np.float32), (1, P, 1)
        ),
        labels=np.zeros((1, P), np.int32),
        box_mask=np.ones((1, P), bool),
        context_indices=np.full((1, P, K), -1, np.int32),
        additional_feats=np.zeros(
            (1, P, cfg.n_additional_feat), np.float32
        ),
    )
    model = build_model(shape_cfg)
    state = create_train_state(
        model, shape_cfg, example, jax.random.PRNGKey(cfg.seed)
    )
    state = _restore_best(cfg, state)
    sd = export_cova_state_dict(
        jax.device_get(state.params),
        jax.device_get(state.batch_stats),
        use_context=cfg.context_size > 0,
        bbox_hidden_dim=cfg.bbox_hidden_dim,
        n_additional_feat=cfg.n_additional_feat,
        roi=cfg.roi,
    )
    out = args.out or os.path.join(
        cfg.results_dir, f"Fold-{cfg.cv_fold} saved_model.pth"
    )
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    torch.save(sd, out)
    print(f"Exported reference-format checkpoint ({len(sd)} tensors) "
          f"to {out}")
    return 0


def cmd_visualize(args) -> int:
    from .train.extract import extract_attention

    cfg = _cfg_from_args(args)
    assert cfg.context_size > 0, (
        "Attention Scores can only be computed if CONTEXT_SIZE > 0"
    )
    train_ds, val_ds, test_ds, _, _ = _load_datasets(cfg, args)
    cfg, model, state, _, _, test_p = _build(cfg, train_ds, val_ds, test_ds)
    state = _restore_best(
        cfg, state, torch_model=getattr(args, "torch_model", None)
    )
    out_dir = os.path.join(
        cfg.results_dir, f"Fold-{cfg.cv_fold} attention visualization"
    )
    data_dir = cfg.data_dir
    tmp_imgs = None
    if args.synthetic:
        if args.no_render:
            data_dir = None
        else:
            # Overlay rendering reads imgs/<id>.png from disk
            # (visualize_bbox, matching the reference's layout); synthetic
            # pages live in memory, so write the needed test images out to
            # a temp dir first. Eval pipelines don't shuffle, so the first
            # max_pages dataset ids are exactly the pages extracted.
            import tempfile

            from PIL import Image

            tmp_imgs = tempfile.TemporaryDirectory()
            img_dir = os.path.join(tmp_imgs.name, "imgs")
            os.makedirs(img_dir)
            n = args.max_pages or len(test_ds.ids)
            for idx, pid in enumerate(test_ds.ids[:n]):
                Image.fromarray(test_ds.image(idx)).save(
                    os.path.join(img_dir, f"{pid}.png")
                )
            data_dir = tmp_imgs.name
    try:
        extract_attention(
            state, test_p, data_dir, out_dir,
            visualize=not args.no_render and data_dir is not None,
            max_pages=args.max_pages,
        )
    finally:
        if tmp_imgs is not None:
            tmp_imgs.cleanup()
    return 0


def sweep_summary(fold_wise_acc_file: str, folds) -> Optional[str]:
    """Aggregate ``fold_wise_acc.csv`` to the published-table format: per
    class, mean ± std over folds (the reference README's results table,
    ``README.md:40-44``, is exactly this aggregation, done externally).

    ``fold_wise_acc.csv`` appends a row per run, so re-running a fold
    leaves stale rows — the LAST row per fold wins. Returns the summary
    text (classwise and macro lines), or None if no requested fold has a
    row yet.
    """
    import numpy as np

    rows = np.loadtxt(
        fold_wise_acc_file, delimiter=",", skiprows=1, ndmin=2
    )
    by_fold = {}
    for r in rows:
        by_fold[int(r[0])] = r  # later rows overwrite earlier ones
    got = [by_fold[f] for f in folds if f in by_fold]
    if not got:
        return None
    acc = np.stack(got)  # columns: fold,val,P,Pm,T,Tm,I,Im
    lines = [f"folds: {[f for f in folds if f in by_fold]}"]
    for label, cols in (("classwise", (2, 4, 6)), ("macro", (3, 5, 7))):
        parts = [
            "%s %.1f ± %.1f" % (name, acc[:, c].mean(), acc[:, c].std())
            for name, c in zip(("Price", "Title", "Image"), cols)
        ]
        lines.append(f"{label}: " + " | ".join(parts))
    # Hard-synthetic runs also record the oracle ceiling band per fold
    # (oracle_acc.csv, _append_oracle_row): aggregate it the same way so
    # the summary shows model vs ceiling side by side.
    oracle_path = os.path.join(
        os.path.dirname(fold_wise_acc_file), "oracle_acc.csv"
    )
    if os.path.isfile(oracle_path):
        orows = np.loadtxt(
            oracle_path, delimiter=",", skiprows=1, ndmin=2
        )
        o_by_fold = {int(r[0]): r for r in orows}
        o_got = [o_by_fold[f] for f in folds if f in o_by_fold]
        if o_got:
            oacc = np.stack(o_got)
            for label, cols in (
                ("oracle latent", (1, 2, 3)),
                ("oracle visible", (4, 5, 6)),
            ):
                parts = [
                    "%s %.1f ± %.1f"
                    % (name, oacc[:, c].mean(), oacc[:, c].std())
                    for name, c in zip(("Price", "Title", "Image"), cols)
                ]
                lines.append(f"{label}: " + " | ".join(parts))
    return "\n".join(lines) + "\n"


def cmd_sweep(args) -> int:
    """5-fold cross-validation sweep: run train once per fold
    (the reference's `for f in 1..5: python main.py -cvf f` workflow),
    then aggregate to the published mean ± std table."""
    rc = 0
    for fold in args.folds:
        fold_args = argparse.Namespace(**vars(args))
        fold_args.cv_fold = fold
        print(f"\n===== Fold {fold} =====")
        rc |= cmd_train(fold_args)
    from .utils.logging import _is_primary

    cfg = _cfg_from_args(args)
    path = os.path.join(cfg.results_dir, "fold_wise_acc.csv")
    # Process 0 owns artifacts, like every other writer (reporting.py).
    if rc == 0 and _is_primary() and os.path.isfile(path):
        summary = sweep_summary(path, args.folds)
        if summary:
            print("\n===== Sweep summary (mean ± std over folds) =====")
            print(summary, end="")
            with open(
                os.path.join(cfg.results_dir, "sweep_summary.txt"), "w"
            ) as f:
                f.write(summary)
    return rc


def cmd_bench(args) -> int:
    from . import benchmarks

    # `-bs` (the train flag everyone reaches for) and `--batch_size_bench`
    # are the same knob here: bench's parser re-defaults batch_size to
    # None so an explicit -bs is detectable; -bsb wins when both given.
    bs = args.batch_size_bench
    if bs is None:
        bs = args.batch_size if args.batch_size is not None else 8
    if args.mode == "e2e":
        # Pipeline-fed sustained throughput + the compute-path ceiling in
        # one JSON line (run_e2e_bench measures both).
        result = benchmarks.run_e2e_bench(
            batch_size=bs,
            n_pages=args.e2e_pages,
            epochs=args.e2e_epochs,
            img_height=args.img_height,
            compute_dtype=args.compute_dtype,
            source=args.e2e_source,
            use_additional_feat=args.additional_feat,
            # None = not given -> run_e2e_bench's own default
            # (min(8, cpus)); an explicit -nw is honored.
            num_threads=args.num_workers or 0,
        )
    else:
        if args.mode == "infer":
            fn = benchmarks.run_infer_bench
        else:
            fn = benchmarks.run_train_bench
        kw = {
            "use_additional_feat": args.additional_feat,
            # Stretch-config knobs (BASELINE.json configs[4]: RN50
            # backbone, 2x-res screenshots, larger K context): the bench
            # honors the same --backbone/-cs flags as `cova train`.
            "backbone": args.backbone,
            "context_size": args.context_size,
        }
        result = fn(
            batch_size=bs,
            steps=args.steps,
            img_height=args.img_height,
            compute_dtype=args.compute_dtype,
            **kw,
        )
    import json

    print(json.dumps(result))
    return 0


def main(argv: Optional[list] = None) -> int:
    # Some environments register a platform plugin from sitecustomize at
    # interpreter start, overriding JAX_PLATFORMS from the environment;
    # re-assert the user's choice through the config API (works until the
    # backend initializes — which is why it must happen here, first).
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # Multi-host wiring MUST precede any backend touch (jax.devices() etc.
    # freeze the topology); on a single host this is a no-op. SURVEY.md §5.8.
    from .parallel import distributed

    distributed.initialize()

    parser = argparse.ArgumentParser(
        "cova", description="CoVA-TPU: context-aware webpage object detection"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    for name, fn in [
        ("train", cmd_train),
        ("eval", cmd_eval),
        ("predict", cmd_predict),
        ("visualize", cmd_visualize),
        ("sweep", cmd_sweep),
        ("export", cmd_export),
    ]:
        p = sub.add_parser(name)
        _add_common_flags(p)
        p.set_defaults(fn=fn)
    for name in ("eval", "predict", "visualize"):
        sub.choices[name].add_argument(
            "--torch_model", default=None, metavar="PATH.pth",
            help="serve a trained REFERENCE checkpoint (model.state_dict() "
                 "as saved by reference train.py:84) instead of an orbax "
                 "checkpoint — ported via utils.torch_port")
    sub.choices["export"].add_argument(
        "--out", default=None, metavar="PATH.pth",
        help="output file (default: '<results_dir>/Fold-<k> "
             "saved_model.pth' — where the reference's evaluate.py:184 "
             "and viz script look for it)")
    sub.choices["export"].add_argument(
        "--n_feat", type=int, default=4,
        help="additional-feature count when --use_additional_feat (export "
             "has no dataset to discover it from; reference data and the "
             "synthetic path both carry 4)")
    sub.choices["eval"].add_argument(
        "--top_k", type=int, default=1,
        help="retrieval depth k of evaluate_model (reference "
             "train.py:102,144-153; published numbers use k=1)")
    sub.choices["predict"].add_argument(
        "--page_ids", type=str, nargs="+", default=None,
        help="predict these pages from --data_dir instead of the fold's "
             "test split (bbox CSV label column is ignored)")
    sub.choices["predict"].add_argument(
        "--out_dir", type=str, default=None,
        help="output dir (default: <results_dir>/Fold-<k> predictions)")
    sub.choices["predict"].add_argument("--max_pages", type=int, default=None)
    sub.choices["predict"].add_argument(
        "--render", action="store_true",
        help="also render <page_id>_pred.png overlays of the retrieval "
             "picks (requires on-disk screenshots)")
    sub.choices["visualize"].add_argument("--no_render", action="store_true")
    sub.choices["visualize"].add_argument("--max_pages", type=int, default=None)
    sub.choices["sweep"].add_argument(
        "--folds", type=int, nargs="+",
        default=list(range(1, N_FOLDS + 1)),
    )

    b = sub.add_parser("bench")
    _add_common_flags(b)
    # Sentinel defaults: an explicitly-given -bs / -nw is detectable (and
    # honored) in cmd_bench; unset falls back to the bench's own defaults
    # (bs=8; e2e threads=min(8, cpus)).
    b.set_defaults(batch_size=None, num_workers=None)
    b.add_argument("--steps", type=int, default=20,
                   help="steps per timed window (train/infer modes; e2e "
                        "is epoch-timed — use --e2e_pages/--e2e_epochs)")
    b.add_argument("--batch_size_bench", "-bsb", type=int, default=None,
                   help="bench batch size (alias: the common -bs flag; "
                        "default 8)")
    b.add_argument("--e2e_pages", type=int, default=64,
                   help="e2e mode: synthetic pages per epoch")
    b.add_argument("--e2e_epochs", type=int, default=3,
                   help="e2e mode: timed epochs (after one warm epoch)")
    b.add_argument("--mode", choices=["train", "infer", "e2e"],
                   default="train",
                   help="train = fwd+bwd+update (device-staged batch); "
                        "infer = serving forward (use -bs 1 for single-"
                        "page latency); e2e = batches fed from the host "
                        "DataPipeline (sustained throughput)")
    b.add_argument("--e2e_source", choices=["mem", "disk"], default="mem",
                   help="e2e feed: mem = in-memory synthetic pages; disk = "
                        "real PNGs/CSVs through the native decode path with "
                        "the decoded-screenshot cache (steady-state epochs "
                        "are cache-warm)")
    b.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
