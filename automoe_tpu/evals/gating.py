"""Gating / full-AutoMoE evaluation + context↔gating correlation analysis.

Metric parity with reference eval/evaluate_gating_network.py:
  * evaluate_automoe (:19-103): ADE/FDE in L1 and Euclidean norms, speed
    L1 (full-profile when horizons line up, else last-step), gating
    entropy, expert usage mean/std (sample-weighted batch aggregation).
  * context_gating_correlation (:170-254): Pearson + Spearman between the
    last-step vehicle-state context features and gating expressed either
    as raw logits or CLR-transformed weights (log w - mean log w), with
    near-constant-column filtering.
Plots (usage bars/pies, heatmaps) live in automoe_tpu.evals.plots.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def automoe_eval_batch(pred: Dict, target_wp: jnp.ndarray, target_spd: jnp.ndarray):
    wp = pred["waypoints"].astype(jnp.float32)
    twp = target_wp.astype(jnp.float32)
    ade_l1 = jnp.mean(jnp.abs(wp - twp))
    fde_l1 = jnp.mean(jnp.abs(wp[:, -1] - twp[:, -1]))
    ade_euclid = jnp.mean(jnp.linalg.norm(wp - twp, axis=-1))
    fde_euclid = jnp.mean(jnp.linalg.norm(wp[:, -1] - twp[:, -1], axis=-1))

    pred_spd = pred.get("speed_seq", pred.get("speed"))
    if pred_spd is not None and pred_spd.shape[1] == target_spd.shape[1]:
        speed_loss = jnp.mean(jnp.abs(pred_spd - target_spd))
    else:
        speed_loss = jnp.mean(jnp.abs(pred["speed"] - target_spd[:, -1:]))

    w = jnp.clip(pred["expert_weights"].astype(jnp.float32), 1e-8)
    entropy = -jnp.mean(jnp.sum(w * jnp.log(w), axis=1))
    return {
        "ade_l1": ade_l1,
        "fde_l1": fde_l1,
        "ade_euclid": ade_euclid,
        "fde_euclid": fde_euclid,
        "speed_loss": speed_loss,
        "entropy": entropy,
        "expert_weights": pred["expert_weights"],
        "gate_logits": pred.get("gate_logits", pred["expert_weights"]),
    }


def evaluate_automoe(
    forward_fn: Callable, variables, batches: Iterable
) -> Dict[str, object]:
    """forward_fn(variables, batch) → AutoMoE output dict."""
    sums = {k: 0.0 for k in (
        "ade_l1", "fde_l1", "ade_euclid", "fde_euclid", "speed_loss", "entropy"
    )}
    total, weights, logits, ctx_rows = 0, [], [], []
    for batch in batches:
        # keep _real_count host-side: jnp.asarray'ing it would give the
        # tail batch a different input pytree and force a full recompile
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k != "_real_count" and not isinstance(v, list)}
        pred = forward_fn(variables, jb)
        m = automoe_eval_batch(pred, jb["waypoints"], jb["speed"])
        # a repeat-padded tail batch carries its real sample count — weight
        # by it so duplicates don't bias the averages (also trim the
        # per-sample rows below: dup rows would bias the correlations)
        bsz = int(batch.get("_real_count", jb["waypoints"].shape[0]))
        for k in sums:
            sums[k] += float(m[k]) * bsz
        weights.append(np.asarray(m["expert_weights"])[:bsz])
        logits.append(np.asarray(m["gate_logits"])[:bsz])
        feats = [np.asarray(jb[k])[:bsz, -1:]
                 for k in ("speed", "steering", "throttle", "brake") if k in jb]
        if feats:
            ctx_rows.append(np.concatenate(feats, axis=1))
        total += bsz
    total = max(1, total)
    w = np.concatenate(weights, axis=0) if weights else np.zeros((0, 1))
    out: Dict[str, object] = {k: v / total for k, v in sums.items()}
    out["expert_usage"] = w.mean(axis=0).tolist() if len(w) else []
    out["expert_std"] = w.std(axis=0).tolist() if len(w) else []
    out["expert_weights"] = w
    out["gate_logits"] = np.concatenate(logits, axis=0) if logits else np.zeros((0, 1))
    out["context_rows"] = (
        np.concatenate(ctx_rows, axis=0) if ctx_rows else np.zeros((0, 0))
    )
    return out


def _clr(weights: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    logw = np.log(np.clip(weights, eps, 1.0))
    return logw - logw.mean(axis=1, keepdims=True)


def context_gating_correlation(
    context: np.ndarray,
    gating: np.ndarray,
    *,
    use_logits: bool = False,
    context_names: Optional[List[str]] = None,
    expert_names: Optional[List[str]] = None,
) -> Dict[str, object]:
    """Pearson/Spearman matrices between context features [N,C] and gating
    [N,E] (logits as-is, weights CLR-transformed)."""
    from scipy.stats import pearsonr, spearmanr

    G = gating.astype(np.float64) if use_logits else _clr(gating)
    C = context.astype(np.float64)
    c_names = list(context_names or []) + [f"ctx_{i}" for i in range(C.shape[1])]
    e_names = list(expert_names or []) + [f"E{j}" for j in range(G.shape[1])]
    c_names, e_names = c_names[: C.shape[1]], e_names[: G.shape[1]]

    c_keep = np.where(C.std(axis=0) > 1e-6)[0]
    g_keep = np.where(G.std(axis=0) > 1e-6)[0]
    C, G = C[:, c_keep], G[:, g_keep]
    c_names = [c_names[i] for i in c_keep]
    e_names = [e_names[j] for j in g_keep]

    pear = np.zeros((C.shape[1], G.shape[1]), np.float32)
    spear = np.zeros_like(pear)
    for i in range(C.shape[1]):
        for j in range(G.shape[1]):
            p = pearsonr(C[:, i], G[:, j])[0]
            s = spearmanr(C[:, i], G[:, j])[0]
            pear[i, j] = 0.0 if np.isnan(p) else p
            spear[i, j] = 0.0 if np.isnan(s) else s
    return {
        "pearson": pear,
        "spearman": spear,
        "context_names": c_names,
        "expert_names": e_names,
    }
