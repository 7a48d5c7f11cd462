"""Training CLI — one entry point for every reference training pipeline.

Subcommands map to the reference trainers (SURVEY.md §2.1 T2-T7):
  bdd              ← training/train_bdd100k_ddp.py (detection/seg/drivable)
  nuscenes         ← training/train_nuscenes_expert_ddp.py
  finetune-carla   ← training/train_carla_bdd_experts_ddp.py (same tasks,
                     CARLA caches)
  nuscenes-2d      ← training/train_carla_nuscenes_expert_2d_ddp.py
  policy           ← training/train_carla_policy.py (--epochs 0 dry-run
                     shape check kept, :178-188)
  gating           ← training/train_gating_network.py (expert ckpt load +
                     freeze)

torchrun/NCCL launch plumbing is gone: data parallelism comes from the
device mesh (all local devices by default; multi-host via
`jax.distributed.initialize` + --multihost).
"""
from __future__ import annotations

import argparse
import json
from typing import Optional

import jax

from automoe_tpu.parallel import MeshSpec, make_mesh
from automoe_tpu.train.loop import TrainConfig, Trainer
from automoe_tpu.train import workloads as W
from automoe_tpu.utils import enable_compile_cache


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--data-root", required=False, default=None)
    p.add_argument("--packed-root", required=False, default=None,
                   help="packed columnar cache root (automoe-pack output; "
                        "<root>/{train,val}) — read via the native C++ "
                        "batch gather instead of per-sample .pt loads")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--learning-rate", type=float, default=2e-4)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--run-name", default="run")
    p.add_argument("--ckpt-root", default="checkpoints")
    p.add_argument("--runs-root", default="runs")
    p.add_argument("--save-freq", type=int, default=0)
    p.add_argument("--resume", choices=["model", "full"], default=None)
    p.add_argument("--resume-from", default="last",
                   help="best | last | epoch_N | step (mid-epoch "
                        "checkpoint written by --save-every-steps)")
    p.add_argument("--save-every-steps", type=int, default=0,
                   help="N>0 writes a mid-epoch 'step' checkpoint every N "
                        "optimizer steps (resume with --resume full "
                        "--resume-from step)")
    p.add_argument("--async-ckpt", action="store_true",
                   help="overlap checkpoint disk writes with training "
                        "(the params snapshot stays synchronous)")
    p.add_argument("--keep-epochs", type=int, default=0,
                   help="with --save-freq: retain only the newest K "
                        "periodic epoch_N checkpoints (best/last/step "
                        "are never GC'd); 0 keeps all")
    p.add_argument("--init-from", default=None,
                   help="warm-start params+batch_stats from another run's "
                        "orbax checkpoint dir (e.g. a BDD expert 'best' "
                        "feeding the CARLA fine-tune) before training; "
                        "optimizer state starts fresh. Unlike --resume, "
                        "the source is any run of the SAME model shape. "
                        "The reference fine-tune inits from ImageNet only "
                        "(train_carla_bdd_experts_ddp.py:196 "
                        "pretrained_backbone=True) — this is the "
                        "checkpoint-chain upgrade, off by default")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--box-cap", type=int, default=48)
    p.add_argument("--matcher", default=None,
                   help="set-matching solver for detection-style losses: "
                        "auction | auction_pallas | hungarian, auction "
                        "variants take an optional iteration-cap suffix "
                        "('auction_pallas:256'); auction_pallas is "
                        "reference-exact at every cap since r4 (in-kernel "
                        "JV escalation), the cap only tunes step time "
                        "(default: auction_pallas on TPU, auction elsewhere)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute (params stay fp32)")
    p.add_argument("--schedule", default=None,
                   choices=["cosine", "constant", "cosine_per_epoch"],
                   help="LR schedule cadence; default mirrors each "
                        "reference trainer: cosine per optimizer step "
                        "(experts), constant (policy — the reference has "
                        "no scheduler there), cosine_per_epoch (gating — "
                        "the reference steps a T_max=epochs*len cosine "
                        "once per epoch)")
    p.add_argument("--no-mesh", action="store_true",
                   help="single-device (skip mesh sharding)")
    p.add_argument("--model-axis", type=int, default=1,
                   help="mesh 'model'-axis size (devices split data x "
                        "model); required > 1 by --spatial and "
                        "--tp-min-dim")
    p.add_argument("--spatial", action="store_true",
                   help="spatial partitioning: shard image HEIGHT over "
                        "the 'model' axis (parallel/sp.py) — for frames "
                        "too large for one chip's HBM; needs "
                        "--model-axis > 1 dividing the image height")
    p.add_argument("--tp-min-dim", type=int, default=0,
                   help="tensor parallelism: shard kernels whose last "
                        "dim is >= this (and divisible by the 'model' "
                        "axis) over 'model' (parallel/tp.py); 0 = off; "
                        "needs --model-axis > 1; exclusive with "
                        "--spatial")
    p.add_argument("--remat", action="store_true",
                   help="rematerialisation: checkpoint each backbone "
                        "block (nn.remat) — the backward recomputes one "
                        "block at a time instead of holding the whole "
                        "stack's activations (~1 extra fwd of FLOPs for "
                        "stack-sized activation HBM); for batches/"
                        "resolutions that don't fit otherwise")
    p.add_argument("--augment", action="store_true",
                   help="fused on-device augmentation in the train step "
                        "(random resized crop + hflip + color jitter, "
                        "box/mask-consistent label geometry, step-RNG "
                        "keyed — ops/augment.py); expert pipelines only; "
                        "OFF by default (the reference has none)")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware training: fake-quantize "
                        "backbone conv weights (per-channel int8) and "
                        "inputs (per-tensor int8) with the straight-"
                        "through estimator, so the model trains against "
                        "the grid the int8 serving path deploys "
                        "(ops/fake_quant.py; stem stays float)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() first")
    p.add_argument("--coordinator", default=None,
                   help="host:port for multihost when cluster auto-detect "
                        "is unavailable (with --num-processes/--process-id)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--debug-nans", action="store_true",
                   help="jax_debug_nans: re-run the op that produced a "
                        "NaN un-jitted and raise with its location "
                        "(slow; debugging only)")
    p.add_argument("--max-inflight", type=int, default=2,
                   help="train steps allowed in flight before the host "
                        "waits on the oldest (0 = sync every step)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the first trained "
                        "epoch into this dir (TensorBoard/Perfetto)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="K>1 scans K optimizer steps per jitted dispatch "
                        "(one stacked H2D + one fetch per K steps; K "
                        "batches of HBM for inputs)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="K>1 accumulates gradients over K loader batches "
                        "and applies their average as ONE optimizer step "
                        "(effective batch K x batch-size with one "
                        "microbatch of activations live — composes with "
                        "--remat for memory; BN normalizes per microbatch, "
                        "torch grad-accum semantics)")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="d>0 tracks an EMA of params (updated inside the "
                        "jitted step), validates it per epoch (val_ema), "
                        "uses it for the best-checkpoint decision, and "
                        "saves it in checkpoints for automoe-serve --ema. "
                        "Typical: 0.999")


def _init_backend(args):
    """Order matters: jax.distributed.initialize() must run before ANY
    backend resolution, and enable_compile_cache() resolves the backend —
    so distributed first, cache second (jit_utils docstring)."""
    if getattr(args, "multihost", False):
        kw = {}
        if getattr(args, "coordinator", None):
            kw = dict(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        jax.distributed.initialize(**kw)
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    enable_compile_cache()


def _mesh(args):
    if args.no_mesh:
        if getattr(args, "spatial", False):
            raise SystemExit("--spatial requires a device mesh")
        if getattr(args, "tp_min_dim", 0) > 0:
            raise SystemExit("--tp-min-dim requires a device mesh")
        return None
    model = getattr(args, "model_axis", 1)
    if getattr(args, "spatial", False) and model < 2:
        raise SystemExit("--spatial needs --model-axis > 1")
    if getattr(args, "tp_min_dim", 0) > 0 and model < 2:
        raise SystemExit("--tp-min-dim needs --model-axis > 1")
    if getattr(args, "spatial", False) and getattr(args, "tp_min_dim", 0) > 0:
        raise SystemExit("--spatial and --tp-min-dim are exclusive "
                         "(both consume the 'model' mesh axis)")
    return make_mesh(MeshSpec(data=-1, model=model))


def _args_dump(args) -> dict:
    return {k: v for k, v in vars(args).items() if isinstance(
        v, (str, int, float, bool, type(None), list))}


def _dtype(args):
    import jax.numpy as jnp

    return jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32


#: reference-faithful schedule per pipeline (make_optimizer docstring)
_DEFAULT_SCHEDULE = {"policy": "constant", "gating": "cosine_per_epoch"}


def _train_cfg(args, pipeline: str = "") -> TrainConfig:
    schedule = getattr(args, "schedule", None) or _DEFAULT_SCHEDULE.get(
        pipeline, "cosine"
    )
    return TrainConfig(
        schedule=schedule,
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        seed=args.seed,
        run_name=args.run_name,
        ckpt_root=args.ckpt_root,
        runs_root=args.runs_root,
        save_freq=args.save_freq,
        resume=args.resume,
        resume_from=args.resume_from,
        max_inflight=getattr(args, "max_inflight", 2),
        steps_per_call=getattr(args, "steps_per_call", 1),
        grad_accum=getattr(args, "grad_accum", 1),
        profile_dir=getattr(args, "profile_dir", None),
        save_every_steps=getattr(args, "save_every_steps", 0),
        async_ckpt=getattr(args, "async_ckpt", False),
        keep_epochs=getattr(args, "keep_epochs", 0),
        spatial=getattr(args, "spatial", False),
        tp_min_dim=getattr(args, "tp_min_dim", 0),
        ema_decay=getattr(args, "ema_decay", 0.0),
        pp_microbatches=getattr(args, "pp_microbatches", 0),
    )


def _graft_init_from(trainer, args):
    """--init-from: seed params+batch_stats from another run's checkpoint.

    Like the gating CLI's --expert-ckpts graft, this seeds FRESH state
    only — when a --resume actually restored a checkpoint of THIS run,
    re-grafting the warm-start source would roll trained weights back on
    every supervisor relaunch."""
    path = getattr(args, "init_from", None)
    if path and not trainer.resumed:
        from automoe_tpu.ckpt.checkpoint import load_variables

        variables = load_variables(path, {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        })
        trainer.state = trainer.state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
        )
        print(f"[cli] warm-started params+batch_stats from {path}")
    return trainer


def _loaders(factory, args, **kw):
    # Within one host the mesh shards each global batch at device_put; across
    # hosts each process reads its own slice (the DistributedSampler role).
    common = dict(
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
    )
    if args.data_root:
        common["root_dir"] = args.data_root
    if getattr(args, "packed_root", None):
        common["packed_root"] = args.packed_root
    train = factory(split="train", **common, **kw)
    val = factory(split="val", shuffle=False, **common, **kw)
    return train, val


def cmd_bdd(args):
    from automoe_tpu.data import (
        get_bdd_detection_loader,
        get_bdd_drivable_loader,
        get_bdd_segmentation_loader,
    )

    factory = {
        "detection": get_bdd_detection_loader,
        "segmentation": get_bdd_segmentation_loader,
        "drivable": get_bdd_drivable_loader,
    }[args.task]
    kw = {"box_cap": args.box_cap} if args.task == "detection" else {}
    wl = W.bdd_expert_workload(
        args.task, image_size=args.image_size, box_cap=args.box_cap,
        bbox_loss_weight=args.bbox_loss_weight, dtype=_dtype(args),
        matcher=args.matcher, remat=args.remat, qat=args.qat,
        augment=args.augment,
    )
    mesh = _mesh(args)
    train, val = _loaders(factory, args, **kw)
    trainer = _graft_init_from(
        Trainer(wl, train, val, _train_cfg(args), mesh=mesh), args
    )
    return trainer.fit(_args_dump(args))


def cmd_finetune_carla(args):
    from automoe_tpu.data import (
        get_carla_detection_loader,
        get_carla_drivable_loader,
        get_carla_segmentation_loader,
    )

    factory = {
        "detection": get_carla_detection_loader,
        "segmentation": get_carla_segmentation_loader,
        "drivable": get_carla_drivable_loader,
    }[args.task]
    kw = {"box_cap": args.box_cap} if args.task == "detection" else {}
    wl = W.bdd_expert_workload(
        args.task, image_size=args.image_size, box_cap=args.box_cap,
        bbox_loss_weight=args.bbox_loss_weight, dtype=_dtype(args),
        matcher=args.matcher, remat=args.remat, qat=args.qat,
        augment=args.augment,
    )
    mesh = _mesh(args)
    train, val = _loaders(factory, args, **kw)
    trainer = _graft_init_from(
        Trainer(wl, train, val, _train_cfg(args), mesh=mesh), args
    )
    return trainer.fit(_args_dump(args))


def cmd_nuscenes(args):
    from automoe_tpu.data import get_nuscenes_loader

    wl = W.nuscenes_workload(
        num_queries=args.num_queries,
        bbox_dim=7,
        use_lidar=args.use_lidar,
        use_tnet=args.use_tnet,
        fusion=args.fusion,
        image_size=args.image_size,
        lidar_cap=args.lidar_cap,
        box_cap=args.box_cap,
        bbox_loss_weight=args.bbox_loss_weight,
        dtype=_dtype(args),
        matcher=args.matcher,
        remat=args.remat,
        qat=args.qat,
    )
    mesh = _mesh(args)
    train, val = _loaders(
        get_nuscenes_loader, args, lidar_cap=args.lidar_cap, box_cap=args.box_cap
    )
    trainer = _graft_init_from(
        Trainer(wl, train, val, _train_cfg(args), mesh=mesh), args
    )
    return trainer.fit(_args_dump(args))


def cmd_nuscenes_2d(args):
    from automoe_tpu.data import get_carla_detection_loader

    wl = W.carla_nuscenes_2d_workload(
        num_queries=args.num_queries, image_size=args.image_size,
        box_cap=args.box_cap, bbox_loss_weight=args.bbox_loss_weight,
        dtype=_dtype(args), remat=args.remat, qat=args.qat,
        augment=args.augment,
    )
    mesh = _mesh(args)
    train, val = _loaders(get_carla_detection_loader, args, box_cap=args.box_cap)
    trainer = _graft_init_from(
        Trainer(wl, train, val, _train_cfg(args), mesh=mesh), args
    )
    return trainer.fit(_args_dump(args))


def cmd_policy(args):
    from automoe_tpu.data import get_carla_sequence_loader

    if args.remat:
        print("[cli] --remat: no effect for policy (EasyBackbone is 4 "
              "convs; nothing worth checkpointing)")
    if args.qat:
        print("[cli] --qat: no effect for policy (int8 serving quantizes "
              "only the expert trunks; the policy head stays bf16)")
    mesh = _mesh(args) if args.epochs else None
    if args.pp_microbatches > 0:
        if args.trunk_depth <= 0:
            raise SystemExit(
                "--pp-microbatches needs --trunk-depth > 0 (only the "
                "deep trunk is stage-partitionable)"
            )
        if args.epochs and (
            mesh is None or dict(mesh.shape).get("model", 1) < 2
        ):
            raise SystemExit("--pp-microbatches needs --model-axis > 1")
        if args.epochs and args.trunk_depth % dict(mesh.shape)["model"]:
            raise SystemExit(
                f"--trunk-depth {args.trunk_depth} must divide by "
                f"--model-axis {dict(mesh.shape)['model']}"
            )
    wl = W.policy_workload(
        horizon=args.horizon, context_dim=args.context_dim,
        image_size=args.image_size, dtype=_dtype(args),
        trunk_depth=args.trunk_depth, trunk_width=args.trunk_width,
        pipeline_mesh=mesh if args.epochs else None,
        pipeline_microbatches=args.pp_microbatches if args.epochs else 0,
    )
    if args.epochs == 0:
        # dry-run shape check (parity with train_carla_policy.py:178-188)
        out = wl.model.apply(
            wl.init_variables(jax.random.key(args.seed)),
            wl.example_batch["image"],
            wl.example_batch.get("context"),
        )
        print({k: tuple(v.shape) for k, v in out.items()})
        return {"dry_run": True}
    train, val = _loaders(get_carla_sequence_loader, args, horizon=args.horizon)
    trainer = _graft_init_from(
        Trainer(wl, train, val, _train_cfg(args, "policy"), mesh=mesh), args
    )
    return trainer.fit(_args_dump(args))


def cmd_gating(args):
    from automoe_tpu.ckpt.compose import load_expert_checkpoints
    from automoe_tpu.configs import default_model_config, load_model_config
    from automoe_tpu.data import get_carla_sequence_loader

    model_cfg = (
        load_model_config(args.model_config)
        if args.model_config
        else default_model_config()
    )
    loss_cfg = json.loads(args.loss_config) if args.loss_config else {}
    if args.remat:
        print("[cli] --remat: no effect for gating (experts run frozen "
              "in eval mode; the backward never crosses the backbones)")
    if args.qat:
        print("[cli] --qat: no effect for gating (experts are frozen "
              "pre-trained weights here; QAT belongs to the expert "
              "trainers whose checkpoints feed this stage)")
    if args.cache_expert_features:
        if args.unfreeze_experts:
            raise SystemExit(
                "--cache-expert-features requires frozen experts (the "
                "cache is one eval pass over fixed weights); drop "
                "--unfreeze-experts"
            )
        if args.parallelism == "ep":
            raise SystemExit(
                "--cache-expert-features removes the expert compute that "
                "--parallelism ep distributes; pick one"
            )
        if args.spatial:
            raise SystemExit(
                "--cache-expert-features is exclusive with --spatial "
                "(spatial sharding targets the expert trunks' image "
                "compute, which the cache skips; the cached step's "
                "remaining image consumer — the policy backbone, "
                "models/automoe.py:214-224 — is below SP's useful size)"
            )
        # --tp-min-dim COMPOSES with the cache (r4, VERDICT r3 item 8):
        # TP shards the *trainable* kernels (extractor MLPs, gating,
        # context, policy — parallel/tp.py), all of which remain in the
        # cached step; equivalence pinned in
        # tests/test_feature_cache.py::test_cached_step_tp_equivalence
    if args.device_resident:
        if not args.cache_expert_features:
            raise SystemExit(
                "--device-resident requires --cache-expert-features "
                "(the resident working set = frames + pooled features + "
                "control targets; without the cache the expert trunks "
                "would also need lidar and recompute per epoch — use "
                "the host loader there)"
            )
        if jax.process_count() > 1 and args.no_mesh:
            raise SystemExit(
                "--device-resident across hosts needs the device mesh "
                "(the resident epoch is a global array assembled from "
                "per-process shards); drop --no-mesh"
            )
        if args.grad_accum > 1:
            raise SystemExit(
                "--device-resident doesn't compose with --grad-accum "
                "(the resident loader pre-groups for steps_per_call; "
                "accumulation is pointless on the ~7 KB/sample cached "
                "working set — raise --batch-size instead)"
            )
    if args.parallelism == "ep":
        from automoe_tpu.parallel.ep import ep_gating_workload

        if args.no_mesh:
            raise SystemExit("--parallelism ep requires a device mesh")
        if args.spatial:
            raise SystemExit(
                "--spatial is exclusive with --parallelism ep (both "
                "consume the 'model' mesh axis)"
            )
        if args.tp_min_dim > 0:
            raise SystemExit(
                "--tp-min-dim is exclusive with --parallelism ep (both "
                "consume the 'model' mesh axis)"
            )
        n_experts = len(model_cfg.experts)
        if len(jax.devices()) % n_experts:
            raise SystemExit(
                f"--parallelism ep needs device count divisible by "
                f"{n_experts} experts (have {len(jax.devices())})"
            )
        mesh = make_mesh(
            MeshSpec(data=len(jax.devices()) // n_experts, model=n_experts)
        )
        wl = ep_gating_workload(
            model_cfg, mesh, loss_config=loss_cfg, image_size=args.image_size,
            freeze_experts=not args.unfreeze_experts, dtype=_dtype(args),
        )
    else:
        wl = W.gating_workload(
            model_cfg, loss_config=loss_cfg, image_size=args.image_size,
            freeze_experts=not args.unfreeze_experts, dtype=_dtype(args),
            cache_features=args.cache_expert_features,
        )
        mesh = _mesh(args)
    train, val = _loaders(
        get_carla_sequence_loader, args, horizon=model_cfg.policy.num_waypoints
    )
    trainer = Trainer(wl, train, val, _train_cfg(args, "gating"), mesh=mesh)
    # expert checkpoints seed FRESH state only: when a resume actually
    # restored a checkpoint, re-grafting the original expert files would
    # roll back expert BN stats (or, with --unfreeze-experts, all trained
    # expert weights) on every relaunch. A supervisor relaunch that found
    # NOTHING to restore (crash before the first checkpoint) still grafts —
    # otherwise gating would train on frozen random experts.
    if args.expert_ckpts and not trainer.resumed:
        paths = args.expert_ckpts.split(",")
        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        variables = load_expert_checkpoints(variables, model_cfg, paths)
        trainer.state = trainer.state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
        )
    if args.cache_expert_features:
        # one eval pass over each dataset AFTER the expert graft/restore —
        # the cache must see the final frozen weights; every later train
        # and val step then skips the four expert trunks entirely
        from automoe_tpu.train.feature_cache import attach_pooled_features

        attach_pooled_features(
            wl.model,
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats},
            train, val,
            batch_size=args.batch_size,
            mesh=trainer.mesh,
            cache_dir=args.feature_cache_dir,
            cache_tags=[f"{args.data_root}:train", f"{args.data_root}:val"],
        )
    if args.device_resident:
        # Stage the (cached) epoch working set HBM-resident once and feed
        # the Trainer pre-grouped device batches: zero per-step H2D, one
        # metrics RPC per steps_per_call. Requires the feature cache.
        # IMAGES ARE STAGED TOO (r5 fix): the trajectory policy head
        # trains THROUGH its own image backbone during gating training
        # (models/automoe.py:214-224), so frames are part of the step's
        # live inputs — the r4 version dropped them for a 4x4 dummy on a
        # false DCE claim and trained a crippled policy backbone. HBM
        # cost is N * S*S*3 * 4 B (fp32 frames); the staging printout
        # reports the MiB — for working sets past a few GiB, shrink the
        # epoch or fall back to the host loader.
        from automoe_tpu.data.device_resident import DeviceEpochLoader

        K = max(1, args.steps_per_call)
        # Multi-host (r5, VERDICT r4 item 5): each process stages only
        # ITS static shard of the dataset (the ShardedSampler slice
        # rule); the loader assembles the shards into one global
        # HBM-resident epoch and reshuffles it with a cluster-identical
        # permutation. Equivalence pinned by
        # tests/test_multihost.py::test_two_process_device_resident_gating.
        indices = None
        if jax.process_count() > 1:
            indices = range(
                jax.process_index(), len(train.dataset), jax.process_count()
            )
        # rebind (not assign): the resident loader trims N to a B*K
        # multiple, so the LR schedule must be rebuilt for the actual
        # batches-per-epoch (Trainer.rebind_train_loader does both).
        trainer.rebind_train_loader(DeviceEpochLoader.from_dataset(
            train.dataset, batch_size=args.batch_size, group_size=K,
            mesh=trainer.mesh, seed=args.seed,
            indices=indices,
            # grouped (two-program) path, NOT index_mode: measured 6%
            # faster sustained on the v5e — the separate group-gather
            # program overlaps the previous group's scan on the device
            # queue, while index_mode's in-program slicing sits on the
            # critical path (BENCHMARKS.md negative results, r5)
        ))
        # Validation stays on the HOST loader: DeviceEpochLoader would
        # silently drop the trimmed tail samples (N -> N//B*B), making
        # val loss — and the is-best checkpoint decision — incomparable
        # with every non-resident run of the same split. The host val
        # path keeps the repeat-padded tail + exact _real_count trim, and
        # runs once per epoch, so its per-batch H2D is off the hot path.
    return trainer.fit(_args_dump(args))


def _expand_preset(argv):
    """`preset <name-or-path> [overrides...]` → full subcommand argv.

    Presets are JSON run configs (automoe_tpu/configs/presets/) — the typed
    replacement for the reference's per-run JSON config files
    (models/configs/*/..._config.json). Trailing args override preset keys
    (argparse last-wins).
    """
    import json as _json
    from pathlib import Path as _Path

    preset_dir = _Path(__file__).resolve().parents[1] / "configs" / "presets"
    if len(argv) < 2 or argv[1] in ("--list", "-l"):
        for f in sorted(preset_dir.glob("*.json")):
            print(f.stem)
        raise SystemExit(0)
    name = argv[1]
    path = _Path(name)
    if not path.exists():
        path = _Path(__file__).resolve().parents[1] / "configs" / "presets" / name
        if not path.suffix:
            path = path.with_suffix(".json")
    cfg = _json.loads(path.read_text())
    out = [cfg.pop("pipeline")]
    for key, val in cfg.items():
        flag = "--" + key.replace("_", "-")
        if isinstance(val, bool):
            if val:
                out.append(flag)
        elif isinstance(val, dict):
            out += [flag, _json.dumps(val)]
        else:
            out += [flag, str(val)]
    return out + list(argv[2:])


def main(argv=None):
    import sys as _sys

    argv = list(argv) if argv is not None else _sys.argv[1:]
    if argv and argv[0] == "preset":
        argv = _expand_preset(argv)
    p = argparse.ArgumentParser("automoe-train")
    sub = p.add_subparsers(dest="cmd", required=True)

    pb = sub.add_parser("bdd")
    pb.add_argument("--task", choices=["detection", "segmentation", "drivable"],
                    required=True)
    pb.add_argument("--bbox-loss-weight", type=float, default=2.0)
    _add_common(pb)
    # per-trainer hyperparameter defaults mirror the reference argparse
    # (train_bdd100k_ddp.py:443-446 etc.) — a user switching CLIs gets
    # the same run without flags; presets/flags override as usual
    pb.set_defaults(fn=cmd_bdd, epochs=50, batch_size=32,
                    learning_rate=1e-4, weight_decay=1e-5)

    pf = sub.add_parser("finetune-carla")
    pf.add_argument("--task", choices=["detection", "segmentation", "drivable"],
                    required=True)
    # the CARLA fine-tune trainer defaults bbox weight to 1.0, not the
    # BDD trainer's 2.0 (train_carla_bdd_experts_ddp.py:128 vs
    # train_bdd100k_ddp.py:185) — the loss recipes are otherwise
    # identical (ignore-index CE == matched-only CE)
    pf.add_argument("--bbox-loss-weight", type=float, default=1.0)
    _add_common(pf)
    pf.set_defaults(fn=cmd_finetune_carla, epochs=20, batch_size=16,
                    learning_rate=2e-4, weight_decay=1e-5)

    pn = sub.add_parser("nuscenes")
    pn.add_argument("--num-queries", type=int, default=100)
    pn.add_argument("--use-lidar", action="store_true")
    pn.add_argument("--use-tnet", action="store_true")
    pn.add_argument("--fusion", choices=["concat", "sum"], default="concat")
    pn.add_argument("--lidar-cap", type=int, default=8192)
    pn.add_argument("--bbox-loss-weight", type=float, default=5.0)
    _add_common(pn)
    pn.set_defaults(fn=cmd_nuscenes, epochs=50, batch_size=32,
                    learning_rate=1e-4, weight_decay=1e-5)

    p2 = sub.add_parser("nuscenes-2d")
    p2.add_argument("--num-queries", type=int, default=196)
    p2.add_argument("--bbox-loss-weight", type=float, default=1.0)
    _add_common(p2)
    p2.set_defaults(fn=cmd_nuscenes_2d, epochs=10, batch_size=16,
                    learning_rate=2e-4, weight_decay=1e-5)

    pp = sub.add_parser("policy")
    pp.add_argument("--horizon", type=int, default=8)
    pp.add_argument("--context-dim", type=int, default=0)
    pp.add_argument("--trunk-depth", type=int, default=0,
                    help="N>0 swaps the 4-conv EasyBackbone for the "
                         "depth-scalable residual GroupNorm trunk "
                         "(models/deep_policy.py) with N blocks")
    pp.add_argument("--trunk-width", type=int, default=128,
                    help="channels of the deep trunk's blocks")
    pp.add_argument("--pp-microbatches", type=int, default=0,
                    help="M>0 pipelines the deep trunk over the mesh's "
                         "'model' axis, GPipe-style with M microbatches "
                         "(parallel/pp.py; needs --trunk-depth divisible "
                         "by --model-axis > 1)")
    _add_common(pp)
    # the reference policy CLI defaults to epochs=0 (an explicit dry-run
    # shape check, train_carla_policy.py:144) and AdamW(3e-4, wd 1e-4)
    pp.set_defaults(fn=cmd_policy, epochs=0, batch_size=32,
                    learning_rate=3e-4, weight_decay=1e-4)

    pg = sub.add_parser("gating")
    pg.add_argument("--model-config", default=None)
    pg.add_argument("--expert-ckpts", default=None,
                    help="comma-separated, one per expert ('' to skip)")
    pg.add_argument("--loss-config", default=None, help="JSON string")
    pg.add_argument("--unfreeze-experts", action="store_true")
    pg.add_argument("--parallelism", choices=["dp", "ep"], default="dp",
                    help="dp: GSPMD data parallel; ep: one expert per "
                         "'model'-axis device (needs devices %% experts == 0)")
    pg.add_argument("--cache-expert-features", action="store_true",
                    help="precompute the frozen experts' pooled gating "
                         "features in one eval pass, then train WITHOUT "
                         "re-running the expert trunks (~3x step time; "
                         "frozen-BN semantics — train/feature_cache.py)")
    pg.add_argument("--device-resident", action="store_true",
                    help="stage the cached epoch working set in HBM once "
                         "and train from pre-grouped device batches (zero "
                         "per-step H2D; needs --cache-expert-features; "
                         "best with --steps-per-call K)")
    pg.add_argument("--feature-cache-dir", default=None,
                    help="persist the pooled-feature cache here (keyed by "
                         "frozen expert weights + dataset); restarts load "
                         "instead of re-running the eval pass")
    _add_common(pg)
    pg.set_defaults(fn=cmd_gating, epochs=100, batch_size=8,
                    learning_rate=1e-4, weight_decay=1e-4)

    args = p.parse_args(argv)
    _init_backend(args)
    return args.fn(args)


if __name__ == "__main__":
    main()
