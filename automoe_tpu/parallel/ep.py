"""Expert parallelism: the four experts spread across the 'model' mesh axis.

The reference runs all experts densely and sequentially on every rank
(models/automoe.py:156-187) — SURVEY.md §2.2 lists EP as absent. Here the
AutoMoE structure maps naturally onto a mesh: inside a `shard_map`, each
device along 'model' executes ONLY its own expert branch
(`lax.switch` on `axis_index('model')` — under SPMD every device runs the
same program but takes one runtime branch), then the [B,256] expert
features all-gather over ICI. Per-device expert compute drops E-fold while
the collective moves only E·B·256 floats. Gating/context/policy run
replicated (they're <1% of the FLOPs).

Requires mesh.shape['model'] == number of experts. Gradients work through
`jax.grad` of the shard_mapped function (switch transposes to zeros on
non-selected branches; the gradient all-reduce over 'model' sums them).

Training mode (parity with the reference trainer, which calls
`model.train()` so expert BN running stats update and dropout is live even
with experts frozen — train_gating_network.py:85 + automoe.py:269-273):
  * dropout/gating RNGs are folded with the 'data' axis index only — the
    'model' axis replicates gating/context/policy, so per-model-row RNG
    divergence would silently desync the replicated compute;
  * BN batch_stats updates are combined as deltas: each expert's delta is
    nonzero on exactly one model row (psum over 'model' is exact), then
    averaged over 'data' shards (exact for means; the variance is the mean
    of per-shard variances — the usual sync-BN-style approximation, see
    docs/DESIGN.md §3);
  * BN *normalization* during EP training uses per-data-shard batch
    statistics (shard batch = B/data_shards), while the dense GSPMD path
    normalizes over the global batch — identical at data=1, a standard
    DDP-style divergence otherwise.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from automoe_tpu.configs import AutoMoEConfig, load_model_config
from automoe_tpu.models.automoe import _last_step, _make_expert
from automoe_tpu.models.context import make_context_extractor
from automoe_tpu.models.extractors import make_extractor
from automoe_tpu.models.policy import TrajectoryPolicy
from automoe_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _tree_sub(a, b):
    return jax.tree.map(lambda x, y: x - y, a, b)


def _tree_add(a, b):
    return jax.tree.map(lambda x, y: x + y, a, b)


def _make_ep_body(
    config,
    mesh: Mesh,
    dtype=jnp.float32,
    *,
    train: bool = False,
    dropout_deterministic: Optional[bool] = None,
):
    """Shared shard_map body. Returns body(variables, batch, rng) ->
    (outputs, new_batch_stats). new_batch_stats is the input batch_stats
    when train=False."""
    cfg: AutoMoEConfig = load_model_config(config)
    E = len(cfg.experts)
    if mesh.shape[MODEL_AXIS] != E:
        raise ValueError(
            f"EP needs mesh model axis == {E} experts, got "
            f"{mesh.shape[MODEL_AXIS]}"
        )
    det = (not train) if dropout_deterministic is None else dropout_deterministic

    def expert_branch(i):
        ecfg = cfg.experts[i]
        expert = _make_expert(ecfg, dtype, name=None)
        extractor = make_extractor(ecfg, dtype)

        def run(variables, image, lidar, rng):
            base_stats = variables.get("batch_stats", {})
            evars = {"params": variables["params"][f"expert_{i}"]}
            has_stats = f"expert_{i}" in base_stats
            if has_stats:
                evars["batch_stats"] = base_stats[f"expert_{i}"]
            if ecfg.type == "nuscenes":
                args = ({"image": image, "lidar": lidar},)
                kw: Dict[str, Any] = {"train": train, "deterministic": det}
            else:
                args = (image,)
                kw = {"train": train}
            if train:
                out, ups = expert.apply(
                    evars, *args, mutable=["batch_stats"],
                    rngs={"dropout": rng}, **kw,
                )
            else:
                out = expert.apply(evars, *args, **kw)
                ups = {}
            xvars = {"params": variables["params"][f"extractor_{i}"]}
            feat = extractor.apply(
                xvars, out, deterministic=det,
                rngs={"dropout": jax.random.fold_in(rng, 101)} if train else None,
            )  # [B,256]
            # Full-structure stats delta so every switch branch returns the
            # same pytree: zeros everywhere except this expert's subtree.
            delta = jax.tree.map(jnp.zeros_like, base_stats)
            if train and has_stats and "batch_stats" in ups:
                delta = {
                    **delta,
                    f"expert_{i}": _tree_sub(
                        ups["batch_stats"], base_stats[f"expert_{i}"]
                    ),
                }
            return feat, delta

        return run

    branches = [expert_branch(i) for i in range(E)]

    from automoe_tpu.models.gating import gating_network_from_config

    gating = gating_network_from_config(cfg, dtype)
    ctx_extractor = make_context_extractor(cfg.context, dtype)
    policy = TrajectoryPolicy(
        horizon=cfg.policy.num_waypoints,
        context_dim=cfg.gating.processed_dim,
        backbone_dim=cfg.policy.backbone_dim,
        dtype=dtype,
    )

    def body(variables, batch, rng):
        image = batch["image"]
        B = image.shape[0]
        zeros = jnp.zeros((B, 1), image.dtype)
        lidar = batch.get("lidar")
        if lidar is None:
            lidar = jnp.zeros((B, 1000, 3), image.dtype)
        base_stats = variables.get("batch_stats", {})

        # per-data-shard RNG; constant along 'model' (see module docstring)
        rng_shard = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        # one expert per device slice along 'model'
        idx = jax.lax.axis_index(MODEL_AXIS)
        feat, expert_delta = jax.lax.switch(
            idx, branches, variables, image, lidar, rng_shard
        )
        feats = jax.lax.all_gather(feat, MODEL_AXIS, axis=0)  # [E,B,256]

        ctx_rngs = (
            {"dropout": jax.random.fold_in(rng_shard, 1)} if train else None
        )
        ctx_vars = {"params": variables["params"]["context_extractor"]}
        speed = _last_step(batch["speed"]) if "speed" in batch else zeros
        steering = _last_step(batch["steering"]) if "steering" in batch else zeros
        throttle = _last_step(batch["throttle"]) if "throttle" in batch else zeros
        brake = _last_step(batch["brake"]) if "brake" in batch else zeros
        if cfg.context.type == "simple":
            context_features = ctx_extractor.apply(
                ctx_vars, speed, steering, throttle, brake,
                deterministic=det, rngs=ctx_rngs,
            )
        else:  # 'full' — same context_data schema as the dense composite
            # (models/automoe.py:110-120; reference context_features.py)
            context_data = {
                "speed": speed,
                "steering": steering,
                "throttle": throttle,
                "brake": brake,
                "hour": batch.get("hour", zeros),
                "minute": batch.get("minute", zeros),
                "weather": batch.get("weather", {}),
                "road": batch.get("road", {}),
            }
            context_features = ctx_extractor.apply(
                ctx_vars, context_data, deterministic=det, rngs=ctx_rngs,
            )
        gating_rngs = (
            {
                "dropout": jax.random.fold_in(rng_shard, 2),
                "gating": jax.random.fold_in(rng_shard, 3),
            }
            if train
            else None
        )
        gating_out = gating.apply(
            {"params": variables["params"]["gating_network"]},
            [feats[i] for i in range(E)],
            context_features,
            train=train,
            deterministic=det,
            rngs=gating_rngs,
        )
        pvars = {"params": variables["params"]["policy_head"]}
        if "policy_head" in base_stats:
            pvars["batch_stats"] = base_stats["policy_head"]
        policy_delta = jax.tree.map(jnp.zeros_like, base_stats)
        if train:
            policy_out, pups = policy.apply(
                pvars, image, gating_out["combined_output"], train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng_shard, 4)},
            )
            if "policy_head" in base_stats and "batch_stats" in pups:
                policy_delta = {
                    **policy_delta,
                    "policy_head": _tree_sub(
                        pups["batch_stats"], base_stats["policy_head"]
                    ),
                }
        else:
            policy_out = policy.apply(
                pvars, image, gating_out["combined_output"]
            )

        if train:
            # Expert deltas live on exactly one 'model' row each → psum is
            # exact; then average per-data-shard updates.
            e_delta = jax.lax.pmean(
                jax.lax.psum(expert_delta, MODEL_AXIS), DATA_AXIS
            )
            # Gating/context/policy run replicated along 'model' (identical
            # deltas) → average over 'data' only.
            p_delta = jax.lax.pmean(policy_delta, DATA_AXIS)
            new_stats = _tree_add(base_stats, _tree_add(e_delta, p_delta))
        else:
            new_stats = base_stats

        speed_seq = policy_out["speed"]
        outputs = {
            "waypoints": policy_out["waypoints"],
            "speed": speed_seq[:, -1:],
            "speed_seq": speed_seq,
            "expert_weights": gating_out["expert_weights"],
            "context_features": context_features,
            "combined_features": gating_out["combined_output"],
            "gate_logits": gating_out["gate_logits"],
        }
        return outputs, new_stats

    return body


def make_ep_forward(config, mesh: Mesh, dtype=jnp.float32):
    """Build fn(variables, batch) -> outputs with expert-parallel execution.

    `variables` is a standard AutoMoE variable tree (replicated); `batch`
    is sharded over 'data'. Output schema matches AutoMoE minus the raw
    per-expert outputs (only the fused features cross devices).
    """
    body = _make_ep_body(config, mesh, dtype=dtype, train=False)

    def fwd(variables, batch):
        out, _ = body(variables, batch, jax.random.key(0))
        return out

    fn = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(fn)


def _gating_loss_terms(pred, batch, lcfg):
    """Shard-aware gating loss (reference train_gating_network.py:21-79).
    Linear means pmean exactly over 'data'; the load-balancing MSE needs
    the GLOBAL mean expert usage before squaring, so usage is pmean'd
    first."""
    from automoe_tpu.losses.trajectory import _l1, _trajectory_terms

    t = _trajectory_terms(pred["waypoints"], batch["waypoints"])
    pred_spd = pred["speed_seq"]
    if pred_spd.shape[1] == batch["speed"].shape[1]:
        speed_loss = _l1(pred_spd, batch["speed"])
    else:
        speed_loss = _l1(pred["speed"], batch["speed"][:, -1:])

    w = pred["expert_weights"].astype(jnp.float32)
    if lcfg.get("use_load_balancing", True):
        mean_usage = jax.lax.pmean(jnp.mean(w, axis=0), DATA_AXIS)
        target_usage = jnp.full_like(mean_usage, 1.0 / mean_usage.shape[0])
        load_balancing = jnp.mean((mean_usage - target_usage) ** 2)
    else:
        load_balancing = jnp.zeros((), jnp.float32)
    if lcfg.get("use_entropy_loss", True):
        entropy = -jnp.mean(jnp.sum(w * jnp.log(w + 1e-8), axis=1))
        entropy_loss = -entropy
    else:
        entropy_loss = jnp.zeros((), jnp.float32)

    local = (
        lcfg.get("ade_weight", 1.0) * t["ade"]
        + lcfg.get("fde_weight", 2.0) * t["fde"]
        + lcfg.get("speed_weight", 0.2) * speed_loss
        + lcfg.get("smoothness_weight", 0.1) * t["smoothness"]
        + lcfg.get("entropy_weight", 0.001) * entropy_loss
    )
    loss = (
        jax.lax.pmean(local, DATA_AXIS)
        + lcfg.get("load_balancing_weight", 0.01) * load_balancing
    )
    metrics = {
        "ade": jax.lax.pmean(t["ade"], DATA_AXIS),
        "fde": jax.lax.pmean(t["fde"], DATA_AXIS),
        "speed": jax.lax.pmean(speed_loss, DATA_AXIS),
        "smoothness": jax.lax.pmean(t["smoothness"], DATA_AXIS),
        "load_balancing": load_balancing,
        "entropy": jax.lax.pmean(entropy_loss, DATA_AXIS),
    }
    return loss, metrics


def ep_gating_loss_fn(
    model_config,
    mesh: Mesh,
    *,
    loss_config: Optional[Dict] = None,
    dtype=jnp.float32,
    dropout_deterministic: Optional[bool] = None,
):
    """Workload-contract loss_fn — loss_fn(params, batch_stats, batch, rng,
    train) -> (loss, (metrics, new_batch_stats)) — whose forward is the
    expert-parallel shard_map. Drop-in for make_train_step/make_eval_step,
    so the generic Trainer drives EP without special cases."""
    cfg = load_model_config(model_config)
    lcfg = dict(loss_config or {})
    smapped = {}
    for tr in (True, False):
        body = _make_ep_body(
            cfg, mesh, dtype=dtype, train=tr,
            dropout_deterministic=dropout_deterministic,
        )

        def loss_body(variables, batch, rng, _body=body):
            pred, new_stats = _body(variables, batch, rng)
            loss, metrics = _gating_loss_terms(pred, batch, lcfg)
            return loss, (metrics, new_stats)

        smapped[tr] = jax.shard_map(
            loss_body,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P()),
            out_specs=P(),
            check_vma=False,
        )

    def loss_fn(params, batch_stats, batch, rng, train):
        return smapped[bool(train)](
            {"params": params, "batch_stats": batch_stats}, batch, rng
        )

    return loss_fn


def ep_gating_workload(
    model_config,
    mesh: Mesh,
    *,
    loss_config: Optional[Dict] = None,
    image_size: int = 256,
    freeze_experts: bool = True,
    dtype=jnp.float32,
):
    """Gating-training Workload with expert-parallel execution — the EP
    counterpart of workloads.gating_workload (same init/variable tree, same
    loss semantics, same freezing), selectable from the CLI via
    `gating --parallelism ep`."""
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.models.automoe import expert_param_mask
    from automoe_tpu.train.workloads import Workload

    cfg = load_model_config(model_config)
    model = create_automoe_model(cfg, dtype=dtype)  # init-compatible tree
    horizon = cfg.policy.num_waypoints
    loss_fn = ep_gating_loss_fn(cfg, mesh, loss_config=loss_config, dtype=dtype)
    example = {
        "image": jnp.zeros((2, image_size, image_size, 3), jnp.float32),
        "lidar": jnp.zeros((2, 1000, 3), jnp.float32),
        "speed": jnp.zeros((2, horizon), jnp.float32),
        "steering": jnp.zeros((2, horizon), jnp.float32),
        "throttle": jnp.zeros((2, horizon), jnp.float32),
        "brake": jnp.zeros((2, horizon), jnp.float32),
        "waypoints": jnp.zeros((2, horizon, 2), jnp.float32),
    }
    mask_fn = (
        (lambda params: expert_param_mask(params, frozen=True))
        if freeze_experts
        else None
    )
    return Workload(
        "gating_ep", model, loss_fn, example,
        trainable_mask_fn=mask_fn, init_args=lambda b: (b,),
    )


def make_ep_gating_train_step(config, mesh: Mesh, tx, *, loss_config=None,
                              dtype=jnp.float32,
                              dropout_deterministic: Optional[bool] = None,
                              train: bool = True):
    """Expert-parallel GATING training step (frozen experts as usual via the
    optimizer mask in `tx`). Gradients flow through the expert switch; the
    shard_map transpose inserts the psum over both mesh axes for the
    replicated parameters (verified vs the dense step in tests/test_ep.py).

    step(state, batch, rng) -> (state, metrics). train=True threads dropout
    RNGs and mutable BN batch_stats through the body (set
    dropout_deterministic=True for noise-free train-mode comparisons)."""
    loss_fn = ep_gating_loss_fn(
        config, mesh, loss_config=loss_config, dtype=dtype,
        dropout_deterministic=dropout_deterministic,
    )

    @jax.jit
    def train_step(state, batch, rng):
        def wrapped(params):
            return loss_fn(params, state.batch_stats, batch, rng, train)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            wrapped, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    return train_step
