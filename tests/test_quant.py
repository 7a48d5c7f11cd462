"""int8 PTQ serving path: BN-fold exactness + quantization fidelity."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.models.resnet import ResNet18Backbone
from automoe_tpu.serving import (
    fold_resnet,
    make_quant_forward,
    quantize_automoe,
    quantize_folded,
    resnet_float_forward,
    resnet_quant_forward,
)
from automoe_tpu.serving.quant import resnet_quant_forward_q8
from automoe_tpu.utils import jit_init

B, S = 2, 64


@pytest.fixture(scope="module")
def backbone_and_vars():
    # local generator, NOT the session `rng`: that one's state advances
    # with every preceding test, and the statistical fidelity bounds here
    # (trunk drift < 1%) are draw-dependent — an unlucky order-dependent
    # draw measured 1.47% (r3). Deterministic input keeps the bounds tight.
    local = np.random.default_rng(1234)
    model = ResNet18Backbone()
    x = jnp.asarray(local.normal(size=(B, S, S, 3)).astype(np.float32))
    variables = jit_init(model, jax.random.key(0), x)
    # make running stats non-trivial (fresh init has mean=0/var=1, which
    # would hide folding bugs): one train-mode pass updates them
    _, upd = model.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": upd["batch_stats"]}
    return model, variables, x


def test_bn_fold_exact(backbone_and_vars):
    """Folded-conv float trunk == flax backbone in eval mode (BN folding
    is exact given running stats)."""
    model, variables, x = backbone_and_vars
    ref = model.apply(variables, x)
    folded = fold_resnet(variables["params"], variables["batch_stats"])
    out = resnet_float_forward(folded, x, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_quant_trunk_fidelity(backbone_and_vars):
    """int8 trunk tracks the float trunk: high cosine similarity and
    bounded relative error on the pooled features."""
    model, variables, x = backbone_and_vars
    folded = fold_resnet(variables["params"], variables["batch_stats"])

    collect = {}
    ref = resnet_float_forward(folded, x, dtype=jnp.float32, collect=collect)
    scales = {k: float(v) for k, v in collect.items()}
    q = quantize_folded(folded)
    out = resnet_quant_forward(q, scales, x, dtype=jnp.float32)

    a = np.asarray(jnp.mean(ref, axis=(1, 2))).reshape(-1)
    b = np.asarray(jnp.mean(out, axis=(1, 2))).reshape(-1)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.995, f"cosine {cos}"
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-12)
    assert rel < 0.08, f"relative error {rel}"


def test_q8_trunk_matches_v1_and_float(backbone_and_vars):
    """The int8-RESIDENT trunk (requant folded into the epilogues,
    serving default since r3) stays close to the bf16-round-trip v1 path
    and holds the same fidelity bounds vs the float trunk."""
    model, variables, x = backbone_and_vars
    folded = fold_resnet(variables["params"], variables["batch_stats"])
    collect = {}
    ref = resnet_float_forward(folded, x, dtype=jnp.float32, collect=collect)
    scales = {k: float(v) for k, v in collect.items()}
    q = quantize_folded(folded)

    v1 = resnet_quant_forward(q, scales, x, dtype=jnp.float32)
    q8 = resnet_quant_forward_q8(q, scales, x, dtype=jnp.float32)

    a = np.asarray(jnp.mean(ref, axis=(1, 2))).reshape(-1)
    for tag, out in (("v1", v1), ("q8", q8)):
        b = np.asarray(jnp.mean(out, axis=(1, 2))).reshape(-1)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.995, f"{tag} cosine {cos}"
        rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-12)
        assert rel < 0.08, f"{tag} relative error {rel}"
    # the two int8 paths agree with each other more tightly than either
    # agrees with float (they share weights/scales; only the residual/
    # requant precision differs)
    b1 = np.asarray(jnp.mean(v1, axis=(1, 2))).reshape(-1)
    b8 = np.asarray(jnp.mean(q8, axis=(1, 2))).reshape(-1)
    rel = np.abs(b1 - b8).mean() / (np.abs(b1).mean() + 1e-12)
    assert rel < 0.05, f"v1-vs-q8 drift {rel}"


def test_fused_stems_match_standalone_q8(backbone_and_vars, rng):
    """fused_stems_q8 (all experts' stems as one dense conv) feeds the q8
    trunk to the same result as the standalone q8 trunk — concatenating
    kernels along the output axis is exact."""
    from automoe_tpu.serving.quant import fused_stems_q8

    model, variables, x = backbone_and_vars
    # two "experts" with different weights: reuse the backbone twice, the
    # second with perturbed params
    folded_a = fold_resnet(variables["params"], variables["batch_stats"])
    vb = jax.tree.map(lambda v: v * 1.01, variables)
    folded_b = fold_resnet(vb["params"], vb["batch_stats"])
    packs, scls = [], []
    for f in (folded_a, folded_b):
        c = {}
        resnet_float_forward(f, x, dtype=jnp.float32, collect=c)
        scls.append({k: float(v) for k, v in c.items()})
        packs.append(quantize_folded(f))

    stems = fused_stems_q8(packs, scls, x, dtype=jnp.float32)
    for i in range(2):
        fused_out = resnet_quant_forward_q8(
            packs[i], scls[i], x, dtype=jnp.float32, stem_in=stems[i]
        )
        solo_out = resnet_quant_forward_q8(
            packs[i], scls[i], x, dtype=jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(fused_out), np.asarray(solo_out), rtol=1e-4, atol=1e-4
        )


def test_s2d_stem_kernel_rewrite_exact(rng):
    """The space-to-depth kernel rewrite is EXACT: a [7,7,3,O] stride-2
    pad-3 conv equals the [4,4,12,O] stride-1 VALID conv on the 2x2-s2d
    pad-(4,4) input, checked in float64 to 1e-10."""
    from automoe_tpu.serving.quant import _s2d_stem_kernel

    B, H, W, O = 2, 32, 32, 8
    x = rng.normal(size=(B, H, W, 3))
    # f32-representable values: _s2d_stem_kernel runs in jnp (f32) but is
    # pure data movement, so the f64 comparison below is still exact
    w = rng.normal(size=(7, 7, 3, O)).astype(np.float32).astype(np.float64)

    def np_conv(x, w, stride, pad):  # NHWC/HWIO valid-after-pad, f64
        xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        kh, kw = w.shape[:2]
        oh = (xp.shape[1] - kh) // stride + 1
        ow = (xp.shape[2] - kw) // stride + 1
        out = np.zeros((x.shape[0], oh, ow, w.shape[3]))
        for a in range(kh):
            for b in range(kw):
                patch = xp[:, a: a + stride * oh: stride,
                           b: b + stride * ow: stride]
                out += np.einsum("bijc,co->bijo", patch, w[a, b])
        return out

    ref = np_conv(x, w, 2, 3)

    xp = np.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    xs = xp.reshape(B, (H + 8) // 2, 2, (W + 8) // 2, 2, 3)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, (H + 8) // 2, (W + 8) // 2, 12
    )
    out = np_conv(xs, np.asarray(_s2d_stem_kernel(w), np.float64), 1, 0)[
        :, : H // 2, : W // 2
    ]
    np.testing.assert_allclose(out, ref, atol=1e-10)


def test_s2d_stems_match_standalone_q8(backbone_and_vars, rng):
    """stems_s2d_q8 (s2d conv + int8-before-pool) feeds the q8 trunk to
    the standalone result. The rewrite is algebraically exact and
    quantize commutes with max, so the int8 stem tensors may differ only
    by reduction-order round ties (±1 quantum, rare)."""
    from automoe_tpu.serving.quant import stems_s2d_q8

    model, variables, x = backbone_and_vars
    folded_a = fold_resnet(variables["params"], variables["batch_stats"])
    vb = jax.tree.map(lambda v: v * 1.01, variables)
    folded_b = fold_resnet(vb["params"], vb["batch_stats"])
    packs, scls = [], []
    for f in (folded_a, folded_b):
        c = {}
        resnet_float_forward(f, x, dtype=jnp.float32, collect=c)
        scls.append({k: float(v) for k, v in c.items()})
        packs.append(quantize_folded(f))

    stems = stems_s2d_q8(packs, scls, x, dtype=jnp.float32)
    for i in range(2):
        # int8 stem tensor vs what the standalone path quantizes to
        p = packs[i]["conv1"]
        from automoe_tpu.serving.quant import _conv

        h = _conv(x, jnp.asarray(p["w"], jnp.float32), 2, 3) + p["b"]
        h = jax.lax.reduce_window(
            jax.nn.relu(h), -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        si = float(max(scls[i]["layer1_0/conv1"], 1e-12)) / 127.0
        ref_q = np.clip(np.round(np.asarray(h) / si), -127, 127).astype(np.int8)
        got_q = np.asarray(stems[i][0])
        diff = np.abs(got_q.astype(np.int32) - ref_q.astype(np.int32))
        assert diff.max() <= 1, f"stem {i}: diff beyond one quantum"
        assert (diff > 0).mean() < 0.01, f"stem {i}: too many round ties"

        # and the full trunk stays tight
        s2d_out = np.asarray(resnet_quant_forward_q8(
            packs[i], scls[i], x, dtype=jnp.float32, stem_in=stems[i]
        ))
        solo_out = np.asarray(resnet_quant_forward_q8(
            packs[i], scls[i], x, dtype=jnp.float32
        ))
        rel = np.abs(s2d_out - solo_out).mean() / (np.abs(solo_out).mean() + 1e-12)
        assert rel < 0.01, f"stem {i}: trunk drift {rel}"


def test_quant_forward_with_lidar(rng):
    """VERDICT r2 #7: a lidar-enabled nuScenes expert serves on the int8
    path (image trunk int8, PointNet branch bf16) and tracks the standard
    model — the shipped nuscenes_v5e preset trains with lidar."""
    from automoe_tpu.models import create_automoe_model

    cfg = {
        "experts": [
            {"type": "drivable", "num_classes": 3},
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 7,
             "fusion": "concat", "use_lidar": True, "use_tnet": False},
        ],
        "gating": {"top_k": 0, "noise_scale": 0.0},
        "context": {"type": "simple"},
        "policy": {"num_waypoints": 4},
    }
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32)),
        "lidar": jnp.asarray(rng.normal(size=(B, 32, 3)).astype(np.float32)),
        "speed": jnp.ones((B, 1), jnp.float32),
        "steering": jnp.zeros((B, 1), jnp.float32),
        "throttle": jnp.zeros((B, 1), jnp.float32),
        "brake": jnp.zeros((B, 1), jnp.float32),
    }
    model = create_automoe_model(cfg, fast_gating_pool=True)
    variables = jit_init(model, jax.random.key(0), batch)
    _, upd = model.apply(
        variables, batch, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1), "gating": jax.random.key(2)},
        deterministic=True,
    )
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}

    ref = model.apply(variables, batch)
    qpack = quantize_automoe(variables, cfg, [batch], dtype=jnp.float32)
    fwd = make_quant_forward(cfg, qpack["scales"], dtype=jnp.float32)
    out = fwd(variables, qpack["experts"], batch)
    assert out["waypoints"].shape == ref["waypoints"].shape
    np.testing.assert_allclose(
        np.asarray(out["expert_weights"]), np.asarray(ref["expert_weights"]),
        atol=0.05,
    )
    wp_ref = np.asarray(ref["waypoints"]).reshape(-1)
    wp_q = np.asarray(out["waypoints"]).reshape(-1)
    rel = np.abs(wp_ref - wp_q).mean() / (np.abs(wp_ref).mean() + 1e-12)
    print("waypoint rel err:", rel)
    assert rel < 0.03, f"waypoint relative error {rel}"


def test_quant_forward_lidar_absent_matches_composite(rng):
    """Camera-only serving of a lidar-TRAINED model (the engine's batch
    never carries 'lidar'): the quant path must mirror the composite's
    lidar-or-zeros substitution (models/automoe.py, reference
    automoe.py:170-175) instead of skipping the PointNet branch — for
    fusion='add' skipping silently shifts the fused features (PointNet of
    zeros is non-zero: biases+BN), for 'concat' it shape-errors."""
    from automoe_tpu.models import create_automoe_model

    for fusion in ("add", "concat"):
        cfg = {
            "experts": [
                {"type": "nuscenes", "num_queries": 8, "bbox_dim": 7,
                 "fusion": fusion, "use_lidar": True, "use_tnet": False},
            ],
            "gating": {"top_k": 0, "noise_scale": 0.0},
            "context": {"type": "simple"},
            "policy": {"num_waypoints": 4},
        }
        train_batch = {
            "image": jnp.asarray(
                rng.normal(size=(B, S, S, 3)).astype(np.float32)
            ),
            "lidar": jnp.asarray(
                rng.normal(size=(B, 32, 3)).astype(np.float32)
            ),
            "speed": jnp.ones((B, 1), jnp.float32),
            "steering": jnp.zeros((B, 1), jnp.float32),
            "throttle": jnp.zeros((B, 1), jnp.float32),
            "brake": jnp.zeros((B, 1), jnp.float32),
        }
        serve_batch = {k: v for k, v in train_batch.items() if k != "lidar"}
        model = create_automoe_model(cfg, fast_gating_pool=True)
        variables = jit_init(model, jax.random.key(0), train_batch)
        _, upd = model.apply(
            variables, train_batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1), "gating": jax.random.key(2)},
            deterministic=True,
        )
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}

        ref = model.apply(variables, serve_batch)  # composite: lidar zeros
        qpack = quantize_automoe(variables, cfg, [train_batch],
                                 dtype=jnp.float32)
        fwd = make_quant_forward(cfg, qpack["scales"], dtype=jnp.float32)
        out = fwd(variables, qpack["experts"], serve_batch)
        wp_ref = np.asarray(ref["waypoints"]).reshape(-1)
        wp_q = np.asarray(out["waypoints"]).reshape(-1)
        rel = np.abs(wp_ref - wp_q).mean() / (np.abs(wp_ref).mean() + 1e-12)
        assert rel < 0.03, f"fusion={fusion} waypoint relative error {rel}"


def test_quant_trunk_gspmd_batch_sharded(backbone_and_vars):
    """The int8 trunk jits over a data-sharded batch on the 8-device mesh
    (serving scale-out path) and matches the single-device result."""
    from automoe_tpu.parallel import MeshSpec, batch_sharding, make_mesh

    model, variables, x = backbone_and_vars
    folded = fold_resnet(variables["params"], variables["batch_stats"])
    collect = {}
    resnet_float_forward(folded, x, dtype=jnp.float32, collect=collect)
    scales = {k: float(v) for k, v in collect.items()}
    q = quantize_folded(folded)

    x8 = jnp.tile(x, (4, 1, 1, 1))  # B=8 across 8 devices
    ref = resnet_quant_forward(q, scales, x8, dtype=jnp.float32)

    mesh = make_mesh(MeshSpec(data=8, model=1))
    xs = jax.device_put(x8, batch_sharding(mesh))
    out = jax.jit(
        lambda xi: resnet_quant_forward(q, scales, xi, dtype=jnp.float32)
    )(xs)
    # eager and jitted codegen may disagree bitwise on x*(1/s) right at a
    # round() boundary, flipping isolated elements by one int8 grid step
    # (the session-scoped rng means this test's input depends on suite
    # ordering — observed once in a 12-file chunk run); allow a tiny
    # fraction of single-step flips, never a systematic divergence
    out, ref = np.asarray(out), np.asarray(ref)
    close = np.isclose(out, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.999, (1.0 - close.mean())
    assert float(np.abs(out - ref).max()) < 0.1


@pytest.mark.slow
def test_quant_engine_closed_loop(tmp_path, rng):
    """InferenceEngine(quantize=True) drives the mock sim end-to-end."""
    from automoe_tpu.infer.engine import InferenceEngine
    from automoe_tpu.infer.run_automoe import run_closed_loop
    from automoe_tpu.infer.sim import MockSim

    cfg = {
        "experts": [
            {"type": "drivable", "num_classes": 3},
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
             "fusion": "sum", "use_lidar": False},
        ],
        "gating": {"top_k": 0, "noise_scale": 0.0},
        "context": {"type": "simple"},
        "policy": {"num_waypoints": 4},
    }
    calib = rng.integers(0, 255, (2, 120, 160, 3), dtype=np.uint8)
    engine = InferenceEngine(
        cfg, camera_hw=(120, 160), model_hw=(64, 64), dtype=jnp.float32,
        quantize=True, calib_frames=calib,
    )
    sim = MockSim(fixed_dt=0.05, camera_hw=(120, 160))
    logs = run_closed_loop(engine, sim, steps=6, out_dir=str(tmp_path))
    assert len(logs) == 6
    for l in logs:
        assert np.isfinite([l["steer"], l["throttle"], l["brake"]]).all()


@pytest.mark.slow
def test_quant_automoe_outputs_track_bf16(rng):
    """Full quantized serving forward tracks the standard model's control
    outputs (waypoints / expert weights) on random weights."""
    from automoe_tpu.models import create_automoe_model

    cfg = {
        "experts": [
            {"type": "detection", "num_classes": 10},
            {"type": "drivable", "num_classes": 3},
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
             "fusion": "sum", "use_lidar": False},
        ],
        "gating": {"top_k": 0, "noise_scale": 0.0},
        "context": {"type": "simple"},
        "policy": {"num_waypoints": 4},
    }
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32)),
        "speed": jnp.ones((B, 1), jnp.float32),
        "steering": jnp.zeros((B, 1), jnp.float32),
        "throttle": jnp.zeros((B, 1), jnp.float32),
        "brake": jnp.zeros((B, 1), jnp.float32),
    }
    model = create_automoe_model(cfg, fast_gating_pool=True)
    init_batch = {**batch, "lidar": jnp.zeros((B, 16, 3), jnp.float32)}
    variables = jit_init(model, jax.random.key(0), init_batch)
    # non-trivial BN running stats
    _, upd = model.apply(
        variables, init_batch, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1), "gating": jax.random.key(2)},
        deterministic=True,
    )
    variables = {"params": variables["params"], "batch_stats": upd["batch_stats"]}

    ref = model.apply(variables, init_batch)
    qpack = quantize_automoe(variables, cfg, [batch], dtype=jnp.float32)
    fwd = make_quant_forward(cfg, qpack["scales"], dtype=jnp.float32)
    out = fwd(variables, qpack["experts"], batch)

    assert out["waypoints"].shape == ref["waypoints"].shape
    np.testing.assert_allclose(
        np.asarray(out["expert_weights"]), np.asarray(ref["expert_weights"]),
        atol=0.05,
    )
    wp_ref = np.asarray(ref["waypoints"]).reshape(-1)
    wp_q = np.asarray(out["waypoints"]).reshape(-1)
    rel = np.abs(wp_ref - wp_q).mean() / (np.abs(wp_ref).mean() + 1e-12)
    print("waypoint rel err:", rel)
    assert rel < 0.03, f"waypoint relative error {rel}"


@pytest.mark.slow
def test_quantized_engine_full_context(rng):
    """quantize=True with context.type='full' traces and runs (review r2:
    the quant forward previously hard-coded the simple-context call
    signature and crashed at trace time)."""
    import jax.numpy as jnp

    from automoe_tpu.infer.engine import InferenceEngine

    cfg = {
        "experts": [
            {"type": "drivable", "num_classes": 3},
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
             "fusion": "sum", "use_lidar": False},
        ],
        "gating": {"top_k": 0, "noise_scale": 0.0},
        "context": {"type": "full"},
        "policy": {"num_waypoints": 4},
    }
    eng = InferenceEngine(
        cfg, camera_hw=(120, 160), model_hw=(64, 64), dtype=jnp.float32,
        quantize=True,
    )
    out = eng.infer(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8), 8.0)
    assert out["waypoints"].shape == (1, 4, 2)
    assert np.isfinite(out["waypoints"]).all()
    w = out["expert_weights"]
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-4)


@pytest.mark.slow
def test_int8_task_metric_fidelity():
    """VERDICT r2 #5: bf16-vs-int8 TASK-metric deltas, not just tensor
    error. Trains a detection and a drivable expert briefly on fixtures
    (so IoU/recall/mIoU are non-degenerate), then runs the reference
    metric definitions (eval/evaluate_bdd100k_expert.py:130-180 ported
    in evals/) through the bf16 apply and the int8 quant apply the eval
    CLI's --quantize uses. Measured deltas are ledgered in
    benchmarks/BENCHMARKS.md."""
    from automoe_tpu.evals import evaluate_detection, evaluate_seg_like
    from automoe_tpu.serving.quant import (
        make_expert_quant_apply,
        quantize_expert,
    )
    from automoe_tpu.train.state import TrainState, make_optimizer
    from automoe_tpu.train.step import make_train_step
    from automoe_tpu.train.workloads import bdd_expert_workload

    rng = np.random.default_rng(7)

    def fit(wl, batch, steps, lr):
        variables = wl.init_variables(jax.random.key(0))
        tx = make_optimizer(learning_rate=lr, weight_decay=1e-4,
                            total_steps=steps)
        state = TrainState.create(
            params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )
        step = make_train_step(wl.loss_fn)
        for _ in range(steps):
            state, _ = step(state, batch, jax.random.key(2))
        return {"params": state.params, "batch_stats": state.batch_stats}

    deltas = {}

    # -- detection: avg matched IoU + recall@0.5 ------------------------
    wl = bdd_expert_workload("detection", image_size=64, box_cap=4)
    det_batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        "bboxes": jnp.asarray(np.tile(
            np.array([[0.2, 0.2, 0.6, 0.6], [0.5, 0.5, 0.9, 0.9],
                      [0, 0, 0, 0], [0, 0, 0, 0]], np.float32), (2, 1, 1))),
        "labels": jnp.asarray(np.tile(np.array([1, 2, -1, -1], np.int32), (2, 1))),
    }
    variables = fit(wl, det_batch, steps=70, lr=4e-4)
    eval_batches = [{k: np.asarray(v) for k, v in det_batch.items()}]
    bf = evaluate_detection(
        jax.jit(lambda v, img: wl.model.apply(v, img)), variables,
        iter(eval_batches), num_classes=wl.model.num_classes,
    )
    qpack, qscales = quantize_expert(
        variables, [det_batch["image"]], dtype=jnp.float32
    )
    q_apply = jax.jit(make_expert_quant_apply(
        "detection", wl.model.num_classes, qscales, dtype=jnp.float32
    ))
    qv = {"q": jax.tree.map(jnp.asarray, qpack), "params": variables["params"]}
    q8 = evaluate_detection(
        q_apply, qv, iter(eval_batches), num_classes=wl.model.num_classes
    )
    deltas["detection"] = {
        k: (bf[k], q8[k], abs(bf[k] - q8[k]))
        for k in ("avg_iou", "recall_0.5")
    }
    assert abs(bf["avg_iou"] - q8["avg_iou"]) < 0.02, deltas
    assert abs(bf["recall_0.5"] - q8["recall_0.5"]) < 0.05, deltas

    # -- drivable: pixel-acc + mIoU -------------------------------------
    wl = bdd_expert_workload("drivable", image_size=64)
    # a learnable segmentation target: class = left/middle/right third
    mask = np.zeros((2, 64, 64), np.int32)
    mask[:, :, 21:43] = 1
    mask[:, :, 43:] = 2
    seg_batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        "mask": jnp.asarray(mask),
    }
    variables = fit(wl, seg_batch, steps=20, lr=1e-3)
    eval_batches = [{k: np.asarray(v) for k, v in seg_batch.items()}]
    bf = evaluate_seg_like(
        jax.jit(lambda v, img: wl.model.apply(v, img)), variables,
        iter(eval_batches), num_classes=wl.model.num_classes,
    )
    qpack, qscales = quantize_expert(
        variables, [seg_batch["image"]], dtype=jnp.float32
    )
    q_apply = jax.jit(make_expert_quant_apply(
        "drivable", wl.model.num_classes, qscales, dtype=jnp.float32
    ))
    qv = {"q": jax.tree.map(jnp.asarray, qpack), "params": variables["params"]}
    q8 = evaluate_seg_like(
        q_apply, qv, iter(eval_batches), num_classes=wl.model.num_classes
    )
    deltas["drivable"] = {
        k: (bf[k], q8[k], abs(bf[k] - q8[k]))
        for k in ("pixel_acc", "mean_iou")
    }
    assert abs(bf["pixel_acc"] - q8["pixel_acc"]) < 0.02, deltas
    assert abs(bf["mean_iou"] - q8["mean_iou"]) < 0.02, deltas
    print("int8 task-metric fidelity:", deltas)
