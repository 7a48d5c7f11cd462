"""Frozen-expert feature cache (train/feature_cache.py).

The gating extractors split as (parameter-free pool) → (trainable MLP)
(models/extractors.py), so one eval pass caching the pooled expert
outputs is a complete substitute for re-running the frozen trunks every
step. These tests pin:
  * cached forward ≡ full eval forward (exact semantics, fp pooling-route
    tolerance — the cache pools low-res logits with the exact
    mean-of-resize weights while the default model GAPs the upsampled map);
  * cached train step ≡ experts_eval train step (same trainable updates,
    expert params/stats bit-untouched in both);
  * precompute/Dataset plumbing (tail padding, per-sample keys);
  * the end-to-end CLI path (`gating --cache-expert-features`).

Reference: the torch AutoMoE recomputes experts inside every gating DDP
step (models/automoe.py:156-187, train_gating_network.py:76-105); the
cache is an optimization it cannot express.
"""
from __future__ import annotations

import json

import jax
import numpy as np
import pytest

from automoe_tpu.models.automoe import (
    automoe_pooled_features,
    expert_param_mask,
)
from automoe_tpu.train.feature_cache import (
    PooledFeatureDataset,
    pooled_keys,
    precompute_pooled_features,
)
from automoe_tpu.train.state import TrainState, make_optimizer
from automoe_tpu.train.step import make_eval_step, make_train_step
from automoe_tpu.train.workloads import gating_workload, pooled_feature_dim

MODEL_CFG = {
    "experts": [
        {"type": "detection", "num_classes": 10},
        {"type": "segmentation", "num_classes": 19},
        {"type": "drivable", "num_classes": 3},
        {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
         "fusion": "sum", "use_lidar": False},
    ],
    "gating": {"top_k": 0, "noise_scale": 0.0},
    "context": {"type": "simple"},
    "policy": {"num_waypoints": 4},
}
S = 32  # image size


def _batch(rng, n=4, horizon=4):
    return {
        "image": rng.normal(size=(n, S, S, 3)).astype(np.float32),
        "speed": rng.uniform(0, 10, (n, horizon)).astype(np.float32),
        "steering": rng.normal(size=(n, horizon)).astype(np.float32),
        "throttle": rng.uniform(0, 1, (n, horizon)).astype(np.float32),
        "brake": np.zeros((n, horizon), np.float32),
        "waypoints": rng.normal(size=(n, horizon, 2)).astype(np.float32),
    }


@pytest.fixture(scope="module")
def wl():
    return gating_workload(MODEL_CFG, image_size=S)


@pytest.fixture(scope="module")
def variables(wl):
    return wl.init_variables(jax.random.key(0))


def test_pooled_dims_and_forward_equivalence(wl, variables, rng):
    batch = _batch(rng)
    pooled = automoe_pooled_features(wl.model, variables, batch)
    dims = [pooled_feature_dim(e) for e in wl.model.config.experts]
    assert [p.shape for p in pooled] == [(4, d) for d in dims]

    out_full = wl.model.apply(variables, batch, train=False)
    out_cached = wl.model.apply(
        variables, batch, train=False, cached_pooled=pooled
    )
    assert out_cached["expert_outputs"] == []
    for key in ("waypoints", "speed_seq", "expert_weights", "gate_logits",
                "combined_features"):
        np.testing.assert_allclose(
            np.asarray(out_full[key]), np.asarray(out_cached[key]),
            rtol=2e-4, atol=2e-5, err_msg=key,
        )


def test_cached_train_step_equals_experts_eval(variables, rng):
    wl_ee = gating_workload(MODEL_CFG, image_size=S, experts_eval=True)
    wl_c = gating_workload(MODEL_CFG, image_size=S, cache_features=True)
    batch = _batch(rng)
    pooled = automoe_pooled_features(wl_ee.model, variables, batch)
    batch_c = dict(batch)
    for k, p in zip(pooled_keys(4), pooled):
        batch_c[k] = np.asarray(p)

    # host copies: the train step donates the state, so each run needs its
    # own device buffers
    import jax.numpy as jnp

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    mask = expert_param_mask(params, frozen=True)

    def run(wl, b):
        tx = make_optimizer(
            learning_rate=1e-3, weight_decay=1e-4, total_steps=10,
            trainable_mask=mask,
        )
        state = TrainState.create(
            params=jax.tree.map(jnp.asarray, params), tx=tx,
            batch_stats=jax.tree.map(jnp.asarray, stats),
        )
        step = make_train_step(wl.loss_fn)
        new_state, metrics = step(state, b, jax.random.key(7))
        return new_state, metrics

    st_ee, m_ee = run(wl_ee, batch)
    st_c, m_c = run(wl_c, batch_c)

    np.testing.assert_allclose(
        float(m_ee["loss"]), float(m_c["loss"]), rtol=1e-5
    )
    # trainable updates match; frozen expert subtrees bit-untouched in both
    flat_ee = jax.tree_util.tree_flatten_with_path(st_ee.params)[0]
    flat_c = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(st_c.params)[0]}
    flat_0 = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    for path, leaf_ee in flat_ee:
        name = jax.tree_util.keystr(path)
        leaf_c = flat_c[name]
        if name.startswith("['expert_"):
            np.testing.assert_array_equal(np.asarray(leaf_ee), flat_0[name])
            np.testing.assert_array_equal(np.asarray(leaf_c), flat_0[name])
        else:
            # pooling-route fp noise (exact-mean-of-resize vs GAP-of-
            # upsample) is amplified by Adam's per-element rescaling
            np.testing.assert_allclose(
                np.asarray(leaf_ee), np.asarray(leaf_c),
                rtol=1e-3, atol=1e-4, err_msg=name,
            )
    # the cached step keeps the FULL batch_stats tree (skipped experts
    # merged back) — same treedef, expert stats unchanged
    assert jax.tree_util.tree_structure(st_c.batch_stats) == \
        jax.tree_util.tree_structure(st_ee.batch_stats)
    for path, leaf in jax.tree_util.tree_flatten_with_path(
        st_c.batch_stats
    )[0]:
        name = jax.tree_util.keystr(path)
        if name.startswith("['expert_"):
            ref = dict(
                (jax.tree_util.keystr(k), v) for k, v in
                jax.tree_util.tree_flatten_with_path(stats)[0]
            )[name]
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(ref))


def test_cached_step_loss_depends_on_image_pixels(variables, rng):
    """Pin the r5 correctness fix: the cached-gating step's IMAGE input
    is NOT dead — the trajectory policy head consumes it through its own
    trainable backbone (models/automoe.py:214-224, mirroring the
    reference's second image consumption in automoe.py). The r4
    device-resident staging dropped frames for a 4x4 dummy on a false
    DCE claim, silently training that backbone on zeros; this test fails
    if anyone reintroduces an image drop upstream of the cached loss
    (measured on the v5e: the image path is 4.4 of the 4.5 ms step)."""
    wl_c = gating_workload(MODEL_CFG, image_size=S, cache_features=True)
    batch = _batch(rng)
    pooled = automoe_pooled_features(wl_c.model, variables, batch)
    batch_c = dict(batch)
    for k, p in zip(pooled_keys(4), pooled):
        batch_c[k] = np.asarray(p)
    batch_c2 = dict(batch_c)
    batch_c2["image"] = batch_c["image"] + 0.5

    def loss_of(b):
        loss, _ = wl_c.loss_fn(
            variables["params"], variables.get("batch_stats", {}),
            b, jax.random.key(3), True,
        )
        return float(loss)

    l1, l2 = loss_of(batch_c), loss_of(batch_c2)
    assert abs(l1 - l2) > 1e-6, (
        "cached-gating loss ignored the image — the policy backbone "
        f"path has been severed (loss {l1} == {l2})"
    )


class _TinyDataset:
    def __init__(self, rng, n=5, horizon=4):
        self.samples = [
            {
                "image": rng.normal(size=(S, S, 3)).astype(np.float32),
                "speed": rng.uniform(0, 10, (horizon,)).astype(np.float32),
                "waypoints": rng.normal(size=(horizon, 2)).astype(np.float32),
            }
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        return dict(self.samples[idx])


def test_precompute_and_dataset_wrapper(wl, variables, rng):
    ds = _TinyDataset(rng, n=5)
    feats = precompute_pooled_features(
        wl.model, variables, ds, batch_size=3, verbose=False
    )  # 5 samples at batch 3 exercises the padded tail
    images = np.stack([ds[i]["image"] for i in range(5)])
    direct = automoe_pooled_features(wl.model, variables, {"image": images})
    for f, d in zip(feats, direct):
        np.testing.assert_allclose(f, np.asarray(d), rtol=1e-5, atol=1e-6)

    # mesh-sharded precompute (batch_size 3 rounds up to the 8-dev axis;
    # the tail padding absorbs it) must produce identical features
    from automoe_tpu.parallel import MeshSpec, make_mesh

    feats_mesh = precompute_pooled_features(
        wl.model, variables, ds, batch_size=3, verbose=False,
        mesh=make_mesh(MeshSpec(data=8, model=1)),
    )
    for f, fm in zip(feats, feats_mesh):
        np.testing.assert_allclose(f, fm, rtol=1e-5, atol=1e-6)

    wrapped = PooledFeatureDataset(ds, feats)
    assert len(wrapped) == 5
    s = wrapped[2]
    for i, key in enumerate(pooled_keys(4)):
        np.testing.assert_array_equal(s[key], feats[i][2])
    assert not hasattr(ds, "read_batch") and not hasattr(wrapped, "read_batch")


def test_cache_bf16_scan_ema_composition(tmp_path, rng):
    """The cached gating step composes with the other training levers
    (--bf16 --steps-per-call --ema-decay) on the 8-device DP mesh — the
    production fast path: 2.73 ms/step on chip (benchmarks/BENCHMARKS.md)."""
    import jax.numpy as jnp

    from automoe_tpu.data.loader import DataLoader
    from automoe_tpu.parallel import MeshSpec, make_mesh
    from automoe_tpu.train.feature_cache import attach_pooled_features
    from automoe_tpu.train.loop import TrainConfig, Trainer

    class _Seq:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            h = 4
            return {
                "image": r.normal(size=(S, S, 3)).astype(np.float32),
                "speed": r.uniform(0, 10, (h,)).astype(np.float32),
                "steering": r.normal(size=(h,)).astype(np.float32),
                "throttle": r.uniform(0, 1, (h,)).astype(np.float32),
                "brake": np.zeros((h,), np.float32),
                "waypoints": r.normal(size=(h, 2)).astype(np.float32),
            }

    wl = gating_workload(MODEL_CFG, image_size=S, dtype=jnp.bfloat16,
                         cache_features=True)
    variables = wl.init_variables(jax.random.key(0))
    train = DataLoader(_Seq(), batch_size=8, num_workers=0, shuffle=False)
    attach_pooled_features(wl.model, variables, train, batch_size=8,
                           verbose=False)
    cfg = TrainConfig(
        epochs=1, learning_rate=1e-3, run_name="cache_combo", log_every=1,
        steps_per_call=2, ema_decay=0.9,
        ckpt_root=str(tmp_path / "c"), runs_root=str(tmp_path / "r"),
    )
    tr = Trainer(wl, train, train, cfg,
                 mesh=make_mesh(MeshSpec(data=8, model=1)))
    out = tr.fit()
    assert np.isfinite(out["best_val_loss"])
    assert int(jax.device_get(tr.state.step)) == 2
    assert tr.state.ema_params is not None
    for x in jax.tree.leaves(tr.state.params):
        assert x.dtype == jnp.float32  # bf16 compute, fp32 master params


def test_cli_gating_cache_smoke(tmp_path, rng):
    import torch

    from tests.test_data import _make_carla_frame
    from tests.torch_mirror import install_torchvision_stub

    install_torchvision_stub()
    from automoe_tpu.train.cli import main as train_main

    root = tmp_path / "carla"
    for split in ("train", "val"):
        d = root / split / "run_001"
        d.mkdir(parents=True)
        for t in range(10):
            torch.save(
                _make_carla_frame(rng, frame_id=t, run_id="run_001"),
                d / f"{t:04d}.pt",
            )
    cfg_path = tmp_path / "model.json"
    cfg_path.write_text(json.dumps(MODEL_CFG))
    out = train_main([
        "gating", "--cache-expert-features",
        "--model-config", str(cfg_path),
        "--data-root", str(root),
        "--epochs", "1", "--batch-size", "4", "--num-workers", "1",
        "--image-size", "32", "--no-mesh",
        "--ckpt-root", str(tmp_path / "ckpt"),
        "--runs-root", str(tmp_path / "runs"),
        "--run-name", "cache_test",
    ])
    assert np.isfinite(out["best_val_loss"])
    assert (tmp_path / "ckpt" / "gating" / "cache_test" / "best").exists()


def test_cli_gating_device_resident_smoke(tmp_path, rng):
    """gating --cache-expert-features --device-resident --steps-per-call 2
    end-to-end on the 8-device mesh: the cached epoch working set —
    INCLUDING real frames (r5 fix: the policy backbone consumes them) —
    stages HBM-resident, the Trainer's pre-grouped scan path consumes
    [K,B,...] device groups, and a best checkpoint lands."""
    import torch

    from tests.test_data import _make_carla_frame
    from tests.torch_mirror import install_torchvision_stub

    install_torchvision_stub()
    from automoe_tpu.train.cli import main as train_main

    root = tmp_path / "carla"
    for split in ("train", "val"):
        d = root / split / "run_001"
        d.mkdir(parents=True)
        for t in range(24):
            torch.save(
                _make_carla_frame(rng, frame_id=t, run_id="run_001"),
                d / f"{t:04d}.pt",
            )
    cfg_path = tmp_path / "model.json"
    cfg_path.write_text(json.dumps(MODEL_CFG))
    out = train_main([
        "gating", "--cache-expert-features", "--device-resident",
        "--steps-per-call", "2",
        "--model-config", str(cfg_path),
        "--data-root", str(root),
        "--epochs", "1", "--batch-size", "8", "--num-workers", "1",
        "--image-size", "32",
        "--ckpt-root", str(tmp_path / "ckpt"),
        "--runs-root", str(tmp_path / "runs"),
        "--run-name", "devres_test",
    ])
    assert np.isfinite(out["best_val_loss"])
    assert (tmp_path / "ckpt" / "gating" / "devres_test" / "best").exists()


def test_cli_device_resident_guard(tmp_path):
    from automoe_tpu.train.cli import main as train_main

    with pytest.raises(SystemExit, match="requires --cache-expert-features"):
        train_main([
            "gating", "--device-resident",
            "--data-root", str(tmp_path), "--no-mesh",
        ])


def test_cli_cache_guards(tmp_path):
    from automoe_tpu.train.cli import main as train_main

    with pytest.raises(SystemExit, match="frozen experts"):
        train_main([
            "gating", "--cache-expert-features", "--unfreeze-experts",
            "--data-root", str(tmp_path), "--no-mesh",
        ])
    with pytest.raises(SystemExit, match="pick one"):
        train_main([
            "gating", "--cache-expert-features", "--parallelism", "ep",
            "--data-root", str(tmp_path),
        ])


def test_cache_dir_persistence(tmp_path, wl, variables, rng, monkeypatch):
    """--feature-cache-dir: second attach over the same frozen experts
    loads from disk (no recompute); changing expert weights changes the
    fingerprint and recomputes."""
    from automoe_tpu.data.loader import DataLoader
    from automoe_tpu.train import feature_cache as fc

    ds = _TinyDataset(rng, n=5)
    loader = DataLoader(ds, batch_size=4, num_workers=0, shuffle=False)
    fc.attach_pooled_features(
        wl.model, variables, loader, batch_size=4, verbose=False,
        cache_dir=str(tmp_path), cache_tags=["root:train"],
    )
    files = list(tmp_path.glob("pooled_*.npz"))
    assert len(files) == 1
    feats0 = loader.dataset.feats

    calls = []
    real = fc.precompute_pooled_features
    monkeypatch.setattr(
        fc, "precompute_pooled_features",
        lambda *a, **k: calls.append(1) or real(*a, **k),
    )
    loader2 = DataLoader(ds, batch_size=4, num_workers=0, shuffle=False)
    fc.attach_pooled_features(
        wl.model, variables, loader2, batch_size=4, verbose=False,
        cache_dir=str(tmp_path), cache_tags=["root:train"],
    )
    assert calls == []  # loaded, not recomputed
    for a, b in zip(feats0, loader2.dataset.feats):
        np.testing.assert_array_equal(a, b)

    # a different tag or different expert weights -> new fingerprint
    fp = fc.cache_fingerprint(variables, 5, "root:train")
    assert fc.cache_fingerprint(variables, 5, "root:val") != fp
    import jax.numpy as jnp
    bumped = dict(variables)
    bumped["params"] = jax.tree.map(lambda x: x, variables["params"])
    k0 = next(k for k in bumped["params"] if k.startswith("expert_"))
    bumped["params"] = {
        **bumped["params"],
        k0: jax.tree.map(lambda x: x + 1e-3, bumped["params"][k0]),
    }
    assert fc.cache_fingerprint(bumped, 5, "root:train") != fp
    # non-expert params don't affect it
    kg = next(k for k in bumped["params"] if not k.startswith("expert_"))
    same = {
        **variables,
        "params": {**variables["params"],
                   kg: jax.tree.map(lambda x: x + 1e-3,
                                    variables["params"][kg])},
    }
    assert fc.cache_fingerprint(same, 5, "root:train") == fp


def test_cached_training_reaches_trainmode_optimum(variables, rng):
    """The semantics ledger (DESIGN.md §3) claims the frozen-BN cached
    regime is a faithful substitute for the reference's train-mode-BN
    gating training — not just per-step equivalent to experts_eval.
    Evidence: train both regimes from identical init on the same fixture
    stream; both must converge, to optima within a few percent (eval-mode
    val loss, identical definition in both)."""
    import jax.numpy as jnp

    wl_ref = gating_workload(MODEL_CFG, image_size=S)  # train-mode BN
    wl_c = gating_workload(MODEL_CFG, image_size=S, cache_features=True)

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    mask = expert_param_mask(params, frozen=True)
    batches = [_batch(np.random.default_rng(i), n=8) for i in range(4)]
    pooled = {
        i: [np.asarray(p) for p in automoe_pooled_features(
            wl_ref.model, variables, b)]
        for i, b in enumerate(batches)
    }

    def train(wl, cached, steps=60):
        tx = make_optimizer(learning_rate=3e-3, weight_decay=1e-4,
                            total_steps=steps, trainable_mask=mask)
        state = TrainState.create(
            params=jax.tree.map(jnp.asarray, params), tx=tx,
            batch_stats=jax.tree.map(jnp.asarray, stats),
        )
        step = make_train_step(wl.loss_fn)
        for t in range(steps):
            b = dict(batches[t % len(batches)])
            if cached:
                for k, p in zip(pooled_keys(4), pooled[t % len(batches)]):
                    b[k] = p
            state, m = step(state, b, jax.random.key(t))
        # identical eval definition for both: eval-mode loss over the
        # fixture set through the REFERENCE workload's loss_fn
        tot = 0.0
        for b in batches:
            loss, _ = wl_ref.loss_fn(state.params, state.batch_stats, b,
                                     jax.random.key(0), False)
            tot += float(loss)
        return tot / len(batches), state

    l_ref, _ = train(wl_ref, cached=False)
    l_c, _ = train(wl_c, cached=True)
    # initial eval loss for the decrease check
    l0 = 0.0
    for b in batches:
        loss, _ = wl_ref.loss_fn(
            jax.tree.map(jnp.asarray, params),
            jax.tree.map(jnp.asarray, stats), b, jax.random.key(0), False)
        l0 += float(loss)
    l0 /= len(batches)
    assert l_ref < 0.7 * l0 and l_c < 0.7 * l0, (l0, l_ref, l_c)
    assert abs(l_ref - l_c) / l_ref < 0.05, (l_ref, l_c)


def test_cached_step_tp_equivalence(variables, rng):
    """Feature cache × tensor parallelism compose (r4, VERDICT r3 item 8):
    TP shards the TRAINABLE kernels (extractor MLPs, gating, context,
    policy — parallel/tp.py), all of which remain in the cached step, so
    a cached train step with wide kernels model-sharded over a
    (data=4, model=2) mesh must reproduce the unsharded cached step's
    updates. The cached step's only removed compute is the frozen expert
    trunks — exactly the part TP never sharded here."""
    import jax.numpy as jnp

    from automoe_tpu.parallel import MeshSpec, make_mesh, shard_batch
    from automoe_tpu.parallel.tp import shard_state

    wl_c = gating_workload(MODEL_CFG, image_size=S, cache_features=True)
    batch = _batch(rng, n=8)
    pooled = automoe_pooled_features(wl_c.model, variables, batch)
    batch_c = dict(batch)
    for k, p in zip(pooled_keys(4), pooled):
        batch_c[k] = np.asarray(p)

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    mask = expert_param_mask(params, frozen=True)

    def fresh_state():
        tx = make_optimizer(
            learning_rate=1e-3, weight_decay=1e-4, total_steps=10,
            trainable_mask=mask,
        )
        return TrainState.create(
            params=jax.tree.map(jnp.asarray, params), tx=tx,
            batch_stats=jax.tree.map(jnp.asarray, stats),
        )

    # unsharded cached run
    step = make_train_step(wl_c.loss_fn)
    st_a = fresh_state()
    for t in range(3):
        st_a, _ = step(st_a, batch_c, jax.random.key(t))

    # TP cached run: wide trainable kernels sharded on 'model'
    mesh = make_mesh(MeshSpec(data=4, model=2))
    st_b, st_sh = shard_state(fresh_state(), mesh, min_dim=64)
    n_sharded = sum(
        1 for l in jax.tree_util.tree_leaves(
            jax.tree.map(lambda x: "model" in str(x.sharding.spec),
                         st_b.params))
        if l
    )
    assert n_sharded > 0, "no kernel met the TP sharding rule"
    step_tp = make_train_step(wl_c.loss_fn, mesh=mesh, state_sharding=st_sh)
    db = shard_batch(batch_c, mesh)
    for t in range(3):
        st_b, _ = step_tp(st_b, db, jax.random.key(t))

    n_skipped = 0
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_flatten_with_path(st_a.params)[0],
        jax.tree_util.tree_flatten_with_path(st_b.params)[0],
    ):
        key = jax.tree_util.keystr(pa)
        assert key == jax.tree_util.keystr(pb)
        # policy-backbone conv biases feed straight into train-mode BN,
        # whose batch-mean subtraction makes their gradient EXACTLY zero
        # mathematically — the computed grad is pure fp reduction noise,
        # and Adam's m/sqrt(v) normalizes that noise to O(1) update
        # directions, so their post-step VALUES are sharding-dependent
        # garbage with zero functional effect (BN re-absorbs any constant
        # shift). Skip them here; functional equivalence is pinned below.
        if "backbone" in key and "conv" in key and "bias" in key:
            # sanity: the noise-driven drift stays at the lr scale
            assert float(np.max(np.abs(
                np.asarray(la) - np.asarray(jax.device_get(lb))
            ))) < 5 * 1e-3
            n_skipped += 1
            continue
        # sharded matmuls change the reduction order; Adam's sqrt(v)
        # rescaling amplifies that fp noise on near-zero second moments
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(jax.device_get(lb)),
            rtol=4e-3, atol=5e-5, err_msg=key,
        )
    assert n_skipped == 4  # conv0-3 biases, nothing else slipped through

    # functional equivalence of the two trained models: same loss on a
    # fresh batch (BN absorbs the conv-bias noise; everything else matched)
    lb = _batch(np.random.default_rng(9), n=8)
    pb2 = automoe_pooled_features(wl_c.model, variables, lb)
    for k, p in zip(pooled_keys(4), pb2):
        lb[k] = np.asarray(p)
    eval_step = make_eval_step(wl_c.loss_fn)
    ma = eval_step(st_a, lb, jax.random.key(99))
    mb = eval_step(jax.device_get(st_b), lb, jax.random.key(99))
    np.testing.assert_allclose(
        float(ma["loss"]), float(mb["loss"]), rtol=2e-4,
    )
