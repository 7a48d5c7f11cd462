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
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from automoe_tpu.configs import AutoMoEConfig, load_model_config
from automoe_tpu.models.automoe import _last_step, _make_expert
from automoe_tpu.models.context import make_context_extractor
from automoe_tpu.models.extractors import make_extractor
from automoe_tpu.models.gating import GatingNetwork
from automoe_tpu.models.policy import TrajectoryPolicy
from automoe_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _make_ep_body(config, mesh: Mesh, dtype=jnp.float32):
    """Shared shard_map body for EP forward / EP training."""
    cfg: AutoMoEConfig = load_model_config(config)
    E = len(cfg.experts)
    if mesh.shape[MODEL_AXIS] != E:
        raise ValueError(
            f"EP needs mesh model axis == {E} experts, got "
            f"{mesh.shape[MODEL_AXIS]}"
        )

    def expert_branch(i):
        ecfg = cfg.experts[i]
        expert = _make_expert(ecfg, dtype, name=None)
        extractor = make_extractor(ecfg, dtype)

        def run(variables, image, lidar):
            evars = {"params": variables["params"][f"expert_{i}"]}
            if f"expert_{i}" in variables.get("batch_stats", {}):
                evars["batch_stats"] = variables["batch_stats"][f"expert_{i}"]
            if ecfg.type == "nuscenes":
                out = expert.apply(evars, {"image": image, "lidar": lidar})
            else:
                out = expert.apply(evars, image)
            xvars = {"params": variables["params"][f"extractor_{i}"]}
            return extractor.apply(xvars, out)  # [B,256]

        return run

    branches = [expert_branch(i) for i in range(E)]

    gating = GatingNetwork(
        num_experts=E,
        context_dim=cfg.context.context_dim,
        expert_output_dims=[e.output_dim for e in cfg.experts],
        processed_dim=cfg.gating.processed_dim,
        hidden_dim=cfg.gating.hidden_dim,
        temperature=cfg.gating.temperature,
        use_softmax=cfg.gating.use_softmax,
        top_k=cfg.gating.top_k if cfg.gating.honor_topk_in_composite else 0,
        noise_scale=(
            cfg.gating.noise_scale if cfg.gating.honor_topk_in_composite else 0.0
        ),
        apply_topk_at_eval=(
            cfg.gating.apply_topk_at_eval if cfg.gating.honor_topk_in_composite
            else False
        ),
        dtype=dtype,
    )
    ctx_extractor = make_context_extractor(cfg.context, dtype)
    policy = TrajectoryPolicy(
        horizon=cfg.policy.num_waypoints,
        context_dim=cfg.gating.processed_dim,
        backbone_dim=cfg.policy.backbone_dim,
        dtype=dtype,
    )

    def body(variables, batch):
        image = batch["image"]
        B = image.shape[0]
        zeros = jnp.zeros((B, 1), image.dtype)
        lidar = batch.get("lidar")
        if lidar is None:
            lidar = jnp.zeros((B, 1000, 3), image.dtype)

        # one expert per device slice along 'model'
        idx = jax.lax.axis_index(MODEL_AXIS)
        feat = jax.lax.switch(idx, branches, variables, image, lidar)
        feats = jax.lax.all_gather(feat, MODEL_AXIS, axis=0)  # [E,B,256]

        context_features = ctx_extractor.apply(
            {"params": variables["params"]["context_extractor"]},
            _last_step(batch["speed"]) if "speed" in batch else zeros,
            _last_step(batch["steering"]) if "steering" in batch else zeros,
            _last_step(batch["throttle"]) if "throttle" in batch else zeros,
            _last_step(batch["brake"]) if "brake" in batch else zeros,
        )
        gating_out = gating.apply(
            {"params": variables["params"]["gating_network"]},
            [feats[i] for i in range(E)],
            context_features,
        )
        pvars = {"params": variables["params"]["policy_head"]}
        if "policy_head" in variables.get("batch_stats", {}):
            pvars["batch_stats"] = variables["batch_stats"]["policy_head"]
        policy_out = policy.apply(
            pvars, image, gating_out["combined_output"]
        )
        speed_seq = policy_out["speed"]
        return {
            "waypoints": policy_out["waypoints"],
            "speed": speed_seq[:, -1:],
            "speed_seq": speed_seq,
            "expert_weights": gating_out["expert_weights"],
            "context_features": context_features,
            "combined_features": gating_out["combined_output"],
            "gate_logits": gating_out["gate_logits"],
        }

    return body


def make_ep_forward(config, mesh: Mesh, dtype=jnp.float32):
    """Build fn(variables, batch) -> outputs with expert-parallel execution.

    `variables` is a standard AutoMoE variable tree (replicated); `batch`
    is sharded over 'data'. Output schema matches AutoMoE minus the raw
    per-expert outputs (only the fused features cross devices).
    """
    body = _make_ep_body(config, mesh, dtype=dtype)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(fn)


def make_ep_gating_train_step(config, mesh: Mesh, tx, *, loss_config=None,
                              dtype=jnp.float32):
    """Expert-parallel GATING training step (frozen experts as usual via the
    optimizer mask in `tx`). Gradients flow through the expert switch; the
    shard_map transpose inserts the psum over both mesh axes for the
    replicated parameters (verified exact vs the dense step in
    tests/test_ep.py).

    The gating loss is made shard-aware: trajectory terms are linear means
    (pmean over 'data' is exact); the load-balancing term needs the GLOBAL
    mean expert usage before the MSE, so usage is pmean'd first.
    """
    cfg = load_model_config(config)
    body = _make_ep_body(cfg, mesh, dtype=dtype)
    lcfg = dict(loss_config or {})

    def loss_body(params_and_stats, batch):
        pred = body(params_and_stats, batch)
        from automoe_tpu.losses.trajectory import _l1, _trajectory_terms

        t = _trajectory_terms(pred["waypoints"], batch["waypoints"])
        pred_spd = pred["speed_seq"]
        if pred_spd.shape[1] == batch["speed"].shape[1]:
            speed_loss = _l1(pred_spd, batch["speed"])
        else:
            speed_loss = _l1(pred["speed"], batch["speed"][:, -1:])

        w = pred["expert_weights"].astype(jnp.float32)
        # GLOBAL mean usage: pmean over the data shards before the MSE
        mean_usage = jax.lax.pmean(jnp.mean(w, axis=0), DATA_AXIS)
        target_usage = jnp.full_like(mean_usage, 1.0 / mean_usage.shape[0])
        load_balancing = jnp.mean((mean_usage - target_usage) ** 2)
        entropy = -jnp.mean(jnp.sum(w * jnp.log(w + 1e-8), axis=1))

        local = (
            lcfg.get("ade_weight", 1.0) * t["ade"]
            + lcfg.get("fde_weight", 2.0) * t["fde"]
            + lcfg.get("speed_weight", 0.2) * speed_loss
            + lcfg.get("smoothness_weight", 0.1) * t["smoothness"]
            + lcfg.get("entropy_weight", 0.001) * (-entropy)
        )
        # linear terms: average the per-shard means; LB is already global
        return (
            jax.lax.pmean(local, DATA_AXIS)
            + lcfg.get("load_balancing_weight", 0.01) * load_balancing
        )

    sharded_loss = jax.shard_map(
        loss_body,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def train_step(state, batch):
        def wrapped(params):
            return sharded_loss(
                {"params": params, "batch_stats": state.batch_stats}, batch
            )

        loss, grads = jax.value_and_grad(wrapped)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss}

    return train_step
