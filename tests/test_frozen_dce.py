"""Frozen-expert backward is DEAD CODE in the compiled gating train step.

The reference freezes experts with requires_grad=False so torch never
builds their backward (train_gating_network.py:226-233 →
models/automoe.py:269-273). Our freeze is functional — value_and_grad
computes grads of EVERY param, and the optax multi_transform routes the
frozen subtree into set_to_zero() — so the equivalent guarantee must
come from XLA: the frozen grads are never read (the global-norm clip is
trainable-only inside multi_transform's masking), so the whole
expert-side backward should be eliminated at compile time.

Measured on the real chip this holds (benchmarks/gating_train_bench.py:
frozen step 16.3 ms ≈ explicit-stop_gradient step 16.2 ms vs all-params
54.2 ms at B=32/256²). This test pins the property structurally so a
refactor that starts *reading* frozen grads (e.g. clipping over the full
tree) can't silently reintroduce a 3.3× step-time regression: the
compiled frozen step must contain materially fewer convolutions than
the unfrozen step, and no more than the explicit stop_gradient build.
"""
import jax
import jax.numpy as jnp
import numpy as np
import re

from automoe_tpu.configs import default_model_config
from automoe_tpu.models.automoe import expert_param_mask
from automoe_tpu.train.state import TrainState, make_optimizer
from automoe_tpu.train.step import make_train_step
from automoe_tpu.train.workloads import gating_workload


def _conv_count(hlo: str) -> int:
    return len(re.findall(r"\sconvolution(?:-start)?\(", hlo))


def test_frozen_gating_step_elides_expert_backward():
    S = 64
    wl = gating_workload(default_model_config(), image_size=S)
    B = 2
    horizon = wl.example_batch["waypoints"].shape[1]
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32)),
        "lidar": jnp.asarray(rng.normal(size=(B, 64, 3)).astype(np.float32)),
        "speed": jnp.zeros((B, horizon), jnp.float32),
        "steering": jnp.zeros((B, horizon), jnp.float32),
        "throttle": jnp.zeros((B, horizon), jnp.float32),
        "brake": jnp.zeros((B, horizon), jnp.float32),
        "waypoints": jnp.zeros((B, horizon, 2), jnp.float32),
    }
    variables = wl.init_variables(jax.random.key(0), batch=dict(batch))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    mask = expert_param_mask(params, frozen=True)

    def build(tx, loss_fn):
        state = TrainState.create(params=params, tx=tx, batch_stats=stats)
        step = make_train_step(loss_fn)
        return step.lower(state, batch, jax.random.key(1)).compile().as_text()

    tx_frozen = make_optimizer(
        learning_rate=4e-4, weight_decay=1e-4, total_steps=10,
        trainable_mask=mask,
    )
    tx_all = make_optimizer(
        learning_rate=4e-4, weight_decay=1e-4, total_steps=10
    )

    def stopgrad_loss(p, bs, b, k, train):
        cut = jax.tree.map(
            lambda leaf, m: leaf if m else jax.lax.stop_gradient(leaf),
            p, mask,
        )
        return wl.loss_fn(cut, bs, b, k, train)

    n_frozen = _conv_count(build(tx_frozen, wl.loss_fn))
    n_stopgrad = _conv_count(build(tx_frozen, stopgrad_loss))
    n_unfrozen = _conv_count(build(tx_all, wl.loss_fn))

    # The unfrozen backward adds ~2 grad convs per trainable conv across
    # 4 ResNet-18 trunks — a large, structural gap, not a tolerance call.
    assert n_unfrozen >= n_frozen + 30, (n_frozen, n_unfrozen)
    # And DCE must be as thorough as the explicit param-boundary cut.
    assert n_frozen <= n_stopgrad, (n_frozen, n_stopgrad)
