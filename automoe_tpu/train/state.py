"""Train state + optimizer factory.

Optimizer regime matches every reference trainer (SURVEY.md §2.1 T2-T7):
AdamW(lr, weight_decay), cosine annealing stepped **per optimizer step**
over epochs*steps_per_epoch (train_bdd100k_ddp.py:39-47,100), global-norm
gradient clip 1.0 (ubiquitous, e.g. :98). Expert freezing is an optax
mask (the functional requires_grad=False, automoe.py:269-273).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # exponential moving average of params (the deploy-side weights in
    # production training; the reference has no counterpart). None = off.
    # The update lives INSIDE apply_gradients so every stepping mode
    # (single, lax.scan of steps, grad-accum) gets it fused into the same
    # XLA program — no extra dispatch, and on a mesh the (replicated)
    # EMA update is element-wise local, no collectives.
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            # initialized AT params (create()), so no zero-bias correction
            # is needed (torch/timm ModelEma semantics)
            new_ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                new_ema,
                new_params,
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )

    @classmethod
    def create(cls, *, params, tx, batch_stats=None, ema_decay: float = 0.0):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats if batch_stats is not None else {},
            opt_state=tx.init(params),
            tx=tx,
            ema_params=(
                # a REAL copy: ema must not alias the params buffers (the
                # train steps donate the whole state; aliased donated
                # inputs are undefined)
                jax.tree.map(lambda p: jnp.array(p, copy=True), params)
                if ema_decay > 0.0
                else None
            ),
            ema_decay=float(ema_decay),
        )


def make_optimizer(
    *,
    learning_rate: float,
    weight_decay: float = 1e-4,
    total_steps: int,
    grad_clip: float = 1.0,
    eta_min: float = 0.0,
    trainable_mask: Optional[Mapping] = None,
    schedule: str = "cosine",
    optimizer: str = "adamw",
    steps_per_epoch: int = 0,
) -> optax.GradientTransformation:
    """Schedules mirror each reference trainer's cadence exactly:

    * 'cosine' — CosineAnnealingLR(T_max=epochs*len) stepped per
      OPTIMIZER step (BDD/nuScenes/CARLA expert trainers,
      train_bdd100k_ddp.py:45-47,100).
    * 'constant' — no scheduler at all (the policy trainer,
      train_carla_policy.py:176 creates AdamW and never a scheduler).
    * 'cosine_per_epoch' — the gating trainer's quirk: T_max counts
      epochs*len STEPS but scheduler.step() runs once per EPOCH
      (train_gating_network.py:285-288,314), so the lr stays in the
      first 1/len of the cosine — a near-constant decay the full
      per-step cosine would badly misrepresent. Needs steps_per_epoch.
    """
    if schedule == "cosine":
        lr = optax.cosine_decay_schedule(
            init_value=learning_rate,
            decay_steps=max(total_steps, 1),
            alpha=eta_min / learning_rate if learning_rate else 0.0,
        )
    elif schedule == "constant":
        lr = learning_rate
    elif schedule == "cosine_per_epoch":
        if steps_per_epoch <= 0:
            raise ValueError("cosine_per_epoch needs steps_per_epoch > 0")
        base = optax.cosine_decay_schedule(
            init_value=learning_rate,
            decay_steps=max(total_steps, 1),
            alpha=eta_min / learning_rate if learning_rate else 0.0,
        )

        def lr(step):  # torch lr_e = cosine(e), e = completed epochs
            return base(step // steps_per_epoch)
    else:
        raise ValueError(f"unknown schedule {schedule}")

    if optimizer == "adamw":
        inner = optax.adamw(lr, weight_decay=weight_decay)
    elif optimizer == "sgd":
        # plain SGD (torch.optim.SGD defaults: no momentum, no wd) — used
        # by the N-step trajectory-parity tests, where Adam's sqrt(v)
        # normalization would amplify fp noise into O(lr) divergence
        inner = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {optimizer}")
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), inner)
    if trainable_mask is not None:
        # Frozen subtrees get zero updates (optax.masked would pass raw
        # gradients through untransformed — wrong for freezing).
        labels = jax.tree.map(
            lambda trainable: "train" if trainable else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, param_labels=labels
        )
    return tx


def lr_at(state_or_step, learning_rate: float, total_steps: int, eta_min: float = 0.0):
    """Cosine LR value at a step (for logging parity with train/lr scalars)."""
    import math

    step = int(getattr(state_or_step, "step", state_or_step))
    t = min(step, total_steps) / max(total_steps, 1)
    return eta_min + (learning_rate - eta_min) * 0.5 * (1 + math.cos(math.pi * t))
