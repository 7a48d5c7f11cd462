"""MoE gating network.

Parity with reference models/gating/gating_network.py:6-207: a context
encoder MLP, per-expert output processors, a gate MLP over
[context ∥ all processed outputs], optional noisy top-k routing, softmax
(or normalized sigmoid) weights, and a weighted sum + output projection.

TPU notes: the per-expert Python loop unrolls at trace time into one fused
XLA graph; noise RNG is an explicit flax 'gating' RNG stream instead of
torch's implicit global RNG.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ContextEncoder(nn.Module):
    """context [B,context_dim] → [B,hidden_dim] (gating_network.py:6-29)."""

    hidden_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, context: jnp.ndarray, *, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(context)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        return nn.Dropout(0.1, deterministic=deterministic)(x)


class ExpertOutputProcessor(nn.Module):
    """[B,expert_dim] → [B,processed_dim], LayerNormed (gating_network.py:31-54)."""

    processed_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, expert_output: jnp.ndarray, *, deterministic: bool = True):
        x = nn.Dense(self.processed_dim, dtype=self.dtype, name="fc1")(expert_output)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.Dense(self.processed_dim, dtype=self.dtype, name="fc2")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)


def _topk_mask(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep top-k logits per row, set the rest to -inf (gating_network.py:114-120)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    vals, idx = jax.lax.top_k(logits, k)
    masked = jnp.full_like(logits, -jnp.inf)
    return jax.vmap(lambda m, i, v: m.at[i].set(v))(masked, idx, vals)


class GatingNetwork(nn.Module):
    num_experts: int
    context_dim: int = 64
    expert_output_dims: Optional[Sequence[int]] = None
    processed_dim: int = 256
    hidden_dim: int = 128
    temperature: float = 1.0
    use_softmax: bool = True
    top_k: int = 0
    noise_type: str = "gumbel"
    noise_scale: float = 1.0
    apply_topk_at_eval: bool = False
    dtype: Dtype = jnp.float32

    def _sample_noise(self, shape, *, allow_missing_rng: bool = False):
        if self.noise_scale <= 0.0:
            return jnp.zeros(shape, self.dtype)
        if allow_missing_rng and not self.has_rng("gating"):
            # analysis paths (context_only_weights via .apply without rngs)
            # fall back to noise-free routing instead of InvalidRngError;
            # pass rngs={'gating': key} for the reference's noisy analysis.
            # Training paths do NOT get this fallback — forgetting the
            # 'gating' stream there must stay a loud error.
            return jnp.zeros(shape, self.dtype)
        rng = self.make_rng("gating")
        if self.noise_type.lower() == "gumbel":
            u = jnp.clip(jax.random.uniform(rng, shape), 1e-6, 1 - 1e-6)
            return -jnp.log(-jnp.log(u)) * self.noise_scale
        if self.noise_type.lower() == "gaussian":
            return jax.random.normal(rng, shape) * self.noise_scale
        return jnp.zeros(shape, self.dtype)

    def _weights_from_logits(self, logits: jnp.ndarray) -> jnp.ndarray:
        if self.use_softmax:
            return jax.nn.softmax(logits / self.temperature, axis=-1)
        w = jax.nn.sigmoid(logits)
        return w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-8)

    @nn.compact
    def __call__(
        self,
        expert_outputs: Optional[List[jnp.ndarray]],
        context: jnp.ndarray,
        *,
        train: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        ctx_feat = ContextEncoder(self.hidden_dim, self.dtype, name="context_encoder")(
            context, deterministic=deterministic
        )

        if expert_outputs is None:
            # Analysis path (get_expert_weights / get_gating_logits,
            # gating_network.py:177-207): zero PROCESSED features are
            # injected straight into the gate input — the expert
            # processors are BYPASSED, not fed zeros (their Dense bias +
            # LayerNorm would make "processed zeros" nonzero).
            processed = None
            all_processed = jnp.zeros(
                (context.shape[0], self.processed_dim * self.num_experts),
                self.dtype,
            )
        else:
            assert len(expert_outputs) == self.num_experts
            processed = [
                ExpertOutputProcessor(
                    self.processed_dim, self.dtype, name=f"expert_processor_{i}"
                )(out, deterministic=deterministic)
                for i, out in enumerate(expert_outputs)
            ]
            all_processed = jnp.concatenate(processed, axis=-1)

        gate_in = jnp.concatenate([ctx_feat, all_processed], axis=-1)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="gate_fc1")(gate_in)
        h = nn.relu(h)
        h = nn.Dropout(0.1, deterministic=deterministic)(h)
        gate_logits = nn.Dense(self.num_experts, dtype=self.dtype, name="gate_fc2")(h)

        apply_topk = self.top_k > 0 and (train or self.apply_topk_at_eval)
        logits_for_weights = gate_logits
        if apply_topk:
            noisy = gate_logits + self._sample_noise(
                gate_logits.shape,
                allow_missing_rng=processed is None,  # analysis path only
            )
            logits_for_weights = _topk_mask(noisy, self.top_k)

        gate_weights = self._weights_from_logits(logits_for_weights)

        if processed is None:
            return {"expert_weights": gate_weights, "gate_logits": gate_logits}

        stacked = jnp.stack(processed, axis=1)  # [B, E, processed_dim]
        combined = jnp.einsum("be,bed->bd", gate_weights.astype(stacked.dtype), stacked)
        final = nn.Dense(self.processed_dim, dtype=self.dtype, name="output_projection")(
            combined
        )

        return {
            "combined_output": final,
            "expert_weights": gate_weights,
            "processed_expert_outputs": processed,
            "gate_logits": gate_logits,
        }

    def context_only_weights(
        self, context: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """Analysis path: expert weights with zero PROCESSED features
        injected past the expert processors (gating_network.py:177-195).
        Call via .apply(..., method='context_only_weights') on bound
        variables. Top-k applies only when apply_topk_at_eval — identical
        to __call__ with train=False."""
        out = self.__call__(None, context, train=False, deterministic=deterministic)
        return out["expert_weights"]

    def context_only_logits(
        self, context: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """Raw gate logits from context only (gating_network.py:197-207)."""
        out = self.__call__(None, context, train=False, deterministic=deterministic)
        return out["gate_logits"]


def gating_network_from_config(
    cfg,
    dtype,
    *,
    name: Optional[str] = None,
    num_experts: Optional[int] = None,
    force_deterministic: bool = False,
):
    """Build the composite's GatingNetwork from an AutoMoEConfig — the ONE
    place that encodes the reference quirk (the composite drops
    top_k/noise unless gating.honor_topk_in_composite opts in,
    automoe.py:78-91). `force_deterministic` zeroes the routing noise for
    serving/analysis paths; `num_experts` overrides for grouped variants
    (FusedAutoMoE). Previously five call sites copy-pasted this block and
    had drifted (two dropped noise_type)."""
    g = cfg.gating
    honor = g.honor_topk_in_composite
    return GatingNetwork(
        num_experts=(num_experts if num_experts is not None
                     else len(cfg.experts)),
        context_dim=cfg.context.context_dim,
        expert_output_dims=[e.output_dim for e in cfg.experts],
        processed_dim=g.processed_dim,
        hidden_dim=g.hidden_dim,
        temperature=g.temperature,
        use_softmax=g.use_softmax,
        top_k=g.top_k if honor else 0,
        noise_type=g.noise_type,
        noise_scale=(0.0 if force_deterministic
                     else (g.noise_scale if honor else 0.0)),
        apply_topk_at_eval=g.apply_topk_at_eval if honor else False,
        dtype=dtype,
        name=name,
    )


class MoEArchitecture(nn.Module):
    """Generic experts+gating+policy wrapper (parity with the reference's
    unused alternative `MoEArchitecture`, gating_network.py:209-247): every
    expert consumes the same input dict, outputs combine via the gating
    network, and a policy head maps the combined features. Kept for API
    completeness; AutoMoE is the shipped composite."""

    experts: Sequence[nn.Module]
    gating_network: GatingNetwork
    policy_head: nn.Module

    @nn.compact
    def __call__(
        self,
        inputs: Dict[str, jnp.ndarray],
        context: jnp.ndarray,
        *,
        train: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        expert_outputs = [expert(inputs) for expert in self.experts]
        gating_output = self.gating_network(
            expert_outputs, context, train=train, deterministic=deterministic
        )
        policy_output = self.policy_head(gating_output["combined_output"])
        return {
            "policy_output": policy_output,
            "expert_weights": gating_output["expert_weights"],
            "combined_features": gating_output["combined_output"],
            "expert_outputs": expert_outputs,
        }
