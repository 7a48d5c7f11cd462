"""Frozen-expert feature cache for gating training.

The gating trainer's step is forward-bound: the four FROZEN expert trunks
cost ~11 of 16.3 ms at B=32/256² (benchmarks/gating_train_bench.py) and
are recomputed every step on weights that never change. Every gating
extractor splits as (parameter-free pool/flatten) → (trainable MLP head)
(models/extractors.py), so the pooled expert outputs — ~7 KB/sample — are
a complete, exact substitute for running the trunks: one eval-mode pass
over the dataset caches them, and every subsequent train/val step feeds
them straight into the extractor heads (`AutoMoE.__call__(...,
cached_pooled=...)`). The trainable parts (extractor MLPs, gating,
context, policy) see identical inputs and train identically.

Semantics note (ledgered in docs/DESIGN.md): the cache fixes the experts
in EVAL mode — BatchNorm normalizes by running statistics and stops
drifting. The reference's gating trainer runs experts in train mode
(torch `requires_grad=False` does not stop BN batch-stat normalization or
running-stat updates — train_gating_network.py:226-233 + model.train()),
so cached training is the standard "frozen BN" variant, not a bit-exact
reproduction of the reference trajectory. It IS exactly equivalent to
`experts_eval=True` training (pinned in tests/test_feature_cache.py),
and validation — always eval-mode — is exactly equivalent in both.

The reference cannot express this optimization: its AutoMoE recomputes
expert forwards inside every DDP step (models/automoe.py:156-187).
"""
from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from automoe_tpu.models.automoe import AutoMoE, automoe_pooled_features

POOLED_KEY = "expert_pooled_{i}"


def pooled_keys(n_experts: int) -> List[str]:
    return [POOLED_KEY.format(i=i) for i in range(n_experts)]


def cache_fingerprint(variables: Dict[str, Any], n: int, tag: str) -> str:
    """Content hash identifying a pooled-feature cache: the frozen expert
    weights (params + batch_stats of every `expert_*` subtree — the ONLY
    model state the pooled features depend on), the dataset length, and a
    caller tag naming the dataset (root/split). Any expert re-graft,
    dataset change, or tag change produces a different file."""
    import hashlib

    h = hashlib.sha256()
    h.update(f"{tag}|{n}|".encode())
    for coll in ("params", "batch_stats"):
        tree = variables.get(coll, {})
        sub = {k: v for k, v in tree.items() if k.startswith("expert_")}
        for path, leaf in sorted(
            jax.tree_util.tree_flatten_with_path(sub)[0],
            key=lambda kv: jax.tree_util.keystr(kv[0]),
        ):
            h.update(jax.tree_util.keystr(path).encode())
            h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
    return h.hexdigest()[:32]


def precompute_pooled_features(
    model: AutoMoE,
    variables: Dict[str, Any],
    dataset,
    *,
    batch_size: int = 32,
    num_workers: int = 8,
    verbose: bool = True,
    mesh=None,
) -> List[np.ndarray]:
    """One ordered eval-mode pass over `dataset` → per-expert [N, d_i]
    float32 arrays of pooled extractor inputs.

    mesh: an optional data-parallel mesh — the eval pass shards each
    batch over the 'data' axis (batch_size is rounded up to a multiple
    of the axis; the tail padding absorbs it). Single-process meshes
    only: this loop feeds every batch whole, while multi-host
    `shard_batch` expects per-process slices — multi-host callers run
    the (cheap) pass replicated instead."""
    put = None
    if mesh is not None and jax.process_count() == 1:
        from automoe_tpu.parallel.mesh import (
            DATA_AXIS, pad_to_multiple, shard_batch,
        )

        batch_size = pad_to_multiple(batch_size, mesh.shape[DATA_AXIS])
        put = lambda b: shard_batch(b, mesh)  # noqa: E731
    elif jax.process_count() > 1:
        # multi-host: params live as replicated GLOBAL arrays — feeding
        # them to this per-process local jit would mix global and local
        # shardings. Fetch the (fully-replicated, hence addressable)
        # replicas to host once; each process then computes the full
        # cache redundantly on its local devices.
        variables = jax.tree.map(np.asarray, variables)
    n = len(dataset)
    fwd = jax.jit(
        lambda v, b: automoe_pooled_features(model, v, b)
    )

    feats: Optional[List[np.ndarray]] = None
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            samples = list(pool.map(dataset.__getitem__, idxs))
            real = len(samples)
            # pad the tail to the compiled batch shape, slice after
            while len(samples) < batch_size:
                samples.append(samples[0])
            batch = {"image": np.stack([s["image"] for s in samples])}
            if "lidar" in samples[0]:
                batch["lidar"] = np.stack([s["lidar"] for s in samples])
            if put is not None:
                batch = put(batch)
            out = fwd(variables, batch)
            if feats is None:
                feats = [
                    np.empty((n,) + tuple(o.shape[1:]), np.float32)
                    for o in out
                ]
            for f, o in zip(feats, out):
                f[start : start + real] = np.asarray(o)[:real]
    if verbose:
        dt = time.time() - t0
        sz = sum(f.nbytes for f in feats) / 1e6
        print(
            f"[feature-cache] {n} samples in {dt:.1f}s "
            f"({n / max(dt, 1e-9):.0f}/s), {sz:.1f} MB pooled features"
        )
    return feats


class PooledFeatureDataset:
    """Wraps a dataset, appending the cached pooled features as
    `expert_pooled_{i}` sample keys (stack_batch carries them through
    collation; the cached gating loss_fn consumes them)."""

    def __init__(self, base, feats: List[np.ndarray]):
        if any(len(f) != len(base) for f in feats):
            raise ValueError(
                f"feature cache rows {[len(f) for f in feats]} != "
                f"dataset length {len(base)}"
            )
        self.base = base
        self.feats = feats
        # expose the native batched-read fast path only when the base has it
        if hasattr(base, "read_batch"):
            self.read_batch = self._read_batch

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        sample = dict(self.base[idx])
        for i, f in enumerate(self.feats):
            sample[POOLED_KEY.format(i=i)] = f[idx]
        return sample

    def _read_batch(self, idxs) -> Dict[str, np.ndarray]:
        batch = dict(self.base.read_batch(idxs))
        ix = np.asarray(idxs)
        for i, f in enumerate(self.feats):
            batch[POOLED_KEY.format(i=i)] = f[ix]
        return batch

    def __getattr__(self, name):
        return getattr(self.base, name)


def attach_pooled_features(
    model: AutoMoE,
    variables: Dict[str, Any],
    *loaders,
    batch_size: int = 32,
    verbose: bool = True,
    mesh=None,
    cache_dir: Optional[str] = None,
    cache_tags: Optional[List[str]] = None,
) -> None:
    """Swap each DataLoader's dataset for its feature-cached wrapper,
    in place. Call AFTER expert checkpoints are grafted into the state —
    the cache must see the final frozen weights. With a mesh, the
    precompute pass runs data-parallel across its devices.

    cache_dir: persist each cache as
    `<cache_dir>/pooled_<fingerprint>.npz`, keyed by the frozen expert
    weights + dataset length + the matching `cache_tags` entry (one per
    loader — name the dataset root/split). A supervisor restart or a
    re-run over the same experts then loads in milliseconds instead of
    redoing the eval pass. Only process 0 writes (multi-host)."""
    import os

    for li, loader in enumerate(loaders):
        if loader is None:
            continue
        ds = loader.dataset
        path = None
        if cache_dir is not None:
            tag = cache_tags[li] if cache_tags else str(li)
            fp = cache_fingerprint(variables, len(ds), tag)
            path = os.path.join(cache_dir, f"pooled_{fp}.npz")
        if path is not None and os.path.exists(path):
            with np.load(path) as z:
                feats = [z[f"feat_{i}"] for i in range(len(z.files))]
            if verbose:
                print(f"[feature-cache] loaded {path} "
                      f"({len(feats[0])} samples)")
        else:
            feats = precompute_pooled_features(
                model, variables, ds,
                batch_size=batch_size, verbose=verbose, mesh=mesh,
            )
            if path is not None and jax.process_index() == 0:
                os.makedirs(cache_dir, exist_ok=True)
                tmp = path + ".tmp.npz"  # .npz suffix: savez won't append
                np.savez(tmp, **{f"feat_{i}": f
                                 for i, f in enumerate(feats)})
                os.replace(tmp, path)
                if verbose:
                    print(f"[feature-cache] saved {path}")
        loader.dataset = PooledFeatureDataset(ds, feats)
