"""Numeric parity: reference PyTorch modules vs our JAX models.

Each test instantiates the *actual reference module* (imported from
/root/reference with a torchvision stub), transfers its weights through
automoe_tpu.ckpt.torch_import, runs both on the same input, and compares
outputs. This validates layouts (NHWC vs NCHW), padding semantics, BN/LN
parameterisation, and the importer itself.
"""
from __future__ import annotations

import numpy as np
import pytest
import torch

from tests.torch_mirror import (
    TorchResNet18,
    add_reference_to_path,
    install_torchvision_stub,
)

install_torchvision_stub()
add_reference_to_path()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from automoe_tpu import ckpt as ck  # noqa: E402
from automoe_tpu.ckpt.torch_import import to_numpy_state_dict  # noqa: E402
from automoe_tpu.configs import ExpertConfig  # noqa: E402
from automoe_tpu.models import (  # noqa: E402
    BDDDetectionExpert,
    BDDDrivableExpert,
    BDDSegmentationExpert,
    EasyBackbone,
    GatingNetwork,
    NuScenesExpert,
    SimpleContextExtractor,
    TrajectoryPolicy,
)
from automoe_tpu.models.extractors import make_extractor  # noqa: E402
from automoe_tpu.models.resnet import ResNet18Backbone  # noqa: E402

TOL = dict(rtol=2e-4, atol=2e-4)  # MLP-only paths: tight
# Conv stacks accumulate fp32 reduction-order noise (verified 2e-15 in f64).
DEEP_TOL = dict(rtol=1e-2, atol=5e-3)


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def assert_close(jax_out, torch_out, tol=TOL, name=""):
    np.testing.assert_allclose(
        np.asarray(jax_out), torch_out.detach().numpy(), err_msg=name, **tol
    )


@pytest.fixture(scope="module")
def image(rng):
    return rng.normal(size=(2, 64, 64, 3)).astype(np.float32)


def _backbone_pair(seed=0, trunc=-2):
    torch.manual_seed(seed)
    tm = TorchResNet18()
    tm.eval()
    seq = torch.nn.Sequential(*list(tm.children())[:trunc])
    return tm, seq


def test_resnet18_backbone_parity(image):
    tm, seq = _backbone_pair()
    sd = {f"backbone.{k}": v for k, v in to_numpy_state_dict(seq).items()}
    variables = ck.import_detection_expert(
        {**sd, "head.0.weight": np.zeros((256, 512, 3, 3), np.float32),
         "head.0.bias": np.zeros((256,), np.float32),
         "head.2.weight": np.zeros((14, 256, 1, 1), np.float32),
         "head.2.bias": np.zeros((14,), np.float32)}
    )
    model = ResNet18Backbone()
    out = model.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.asarray(image),
    )
    with torch.no_grad():
        ref = seq(nchw(image)).permute(0, 2, 3, 1)
    assert_close(out, ref, tol=DEEP_TOL, name="resnet18 trunk")


def test_detection_expert_parity(image):
    import models.experts.bdd_detection_expert as ref_mod

    torch.manual_seed(1)
    tmodel = ref_mod.BDDDetectionExpert(num_classes=10, pretrained_backbone=False)
    tmodel.eval()
    variables = ck.import_detection_expert(to_numpy_state_dict(tmodel))
    model = BDDDetectionExpert(num_classes=10)
    out = model.apply(variables, jnp.asarray(image))
    with torch.no_grad():
        ref = tmodel(nchw(image))
    assert_close(out["class_logits"], ref["class_logits"].permute(0, 2, 3, 1), tol=DEEP_TOL)
    assert_close(out["bbox_deltas"], ref["bbox_deltas"].permute(0, 2, 3, 1), tol=DEEP_TOL)


@pytest.mark.parametrize(
    "ref_name,cls,jax_cls,n_cls",
    [
        ("bdd_segmentation_expert", "BDDSegmentationExpert", BDDSegmentationExpert, 19),
        ("bdd_drivable_expert", "BDDDrivableExpert", BDDDrivableExpert, 3),
    ],
)
def test_seg_like_expert_parity(image, ref_name, cls, jax_cls, n_cls):
    import importlib

    ref_mod = importlib.import_module(f"models.experts.{ref_name}")
    torch.manual_seed(2)
    tmodel = getattr(ref_mod, cls)(num_classes=n_cls, pretrained_backbone=False)
    tmodel.eval()
    variables = ck.import_segmentation_expert(to_numpy_state_dict(tmodel))
    model = jax_cls(num_classes=n_cls)
    out = model.apply(variables, jnp.asarray(image))
    with torch.no_grad():
        ref = tmodel(nchw(image)).permute(0, 2, 3, 1)
    # bilinear upsample implementations differ at borders; compare loosely
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy(), rtol=5e-3, atol=5e-3, err_msg=ref_name
    )


def test_nuscenes_expert_parity(image, rng):
    import models.experts.nuscenes_expert as ref_mod

    torch.manual_seed(3)
    tmodel = ref_mod.NuScenesExpert(
        num_queries=16, fusion="sum", use_lidar=True, use_tnet=False, bbox_dim=4
    )
    tmodel.eval()
    lidar = rng.normal(size=(2, 64, 3)).astype(np.float32)
    variables = ck.import_nuscenes_expert(to_numpy_state_dict(tmodel))
    model = NuScenesExpert(
        num_queries=16, fusion="sum", use_lidar=True, use_tnet=False, bbox_dim=4
    )
    out = model.apply(
        variables, {"image": jnp.asarray(image), "lidar": jnp.asarray(lidar)}
    )
    with torch.no_grad():
        ref = tmodel({"image": nchw(image), "lidar": torch.from_numpy(lidar)})
    assert_close(out["class_logits"], ref["class_logits"], tol=DEEP_TOL, name="nusc cls")
    assert_close(out["bbox_preds"], ref["bbox_preds"], tol=DEEP_TOL, name="nusc bbox")


def test_gating_network_parity(rng):
    import models.gating.gating_network as ref_mod

    torch.manual_seed(4)
    tmodel = ref_mod.GatingNetwork(
        num_experts=4, context_dim=64, expert_output_dims=[256] * 4,
        processed_dim=256, hidden_dim=128, temperature=1.0, use_softmax=True,
        top_k=2, noise_scale=0.0, apply_topk_at_eval=True,
    )
    tmodel.eval()
    feats = [rng.normal(size=(3, 256)).astype(np.float32) for _ in range(4)]
    ctx = rng.normal(size=(3, 64)).astype(np.float32)
    variables = ck.import_gating(to_numpy_state_dict(tmodel))
    model = GatingNetwork(
        num_experts=4, top_k=2, noise_scale=0.0, apply_topk_at_eval=True
    )
    out = model.apply(variables, [jnp.asarray(f) for f in feats], jnp.asarray(ctx))
    with torch.no_grad():
        ref = tmodel([torch.from_numpy(f) for f in feats], torch.from_numpy(ctx))
    assert_close(out["combined_output"], ref["combined_output"], name="combined")
    assert_close(out["expert_weights"], ref["expert_weights"], name="weights")
    assert_close(out["gate_logits"], ref["gate_logits"], name="logits")


def test_gating_context_only_parity(rng):
    """Analysis paths (get_expert_weights/get_gating_logits,
    gating_network.py:177-207): zero PROCESSED features bypass the expert
    processors. expert_output_dims != processed_dim on purpose — the old
    feed-zeros-through-processors implementation required them equal and
    diverged numerically (ADVICE r1)."""
    import models.gating.gating_network as ref_mod

    torch.manual_seed(7)
    tmodel = ref_mod.GatingNetwork(
        num_experts=3, context_dim=64, expert_output_dims=[96] * 3,
        processed_dim=256, hidden_dim=128, temperature=1.0, use_softmax=True,
        top_k=2, noise_scale=0.0, apply_topk_at_eval=False,
    )
    tmodel.eval()
    ctx = rng.normal(size=(3, 64)).astype(np.float32)
    variables = ck.import_gating(to_numpy_state_dict(tmodel))
    model = GatingNetwork(
        num_experts=3, expert_output_dims=[96] * 3, processed_dim=256,
        top_k=2, noise_scale=0.0, apply_topk_at_eval=False,
    )
    w = model.apply(variables, jnp.asarray(ctx), method="context_only_weights")
    logits = model.apply(variables, jnp.asarray(ctx), method="context_only_logits")
    with torch.no_grad():
        ref_w = tmodel.get_expert_weights(torch.from_numpy(ctx))
        ref_l = tmodel.get_gating_logits(torch.from_numpy(ctx))
    assert_close(w, ref_w, name="context-only weights")
    assert_close(logits, ref_l, name="context-only logits")


def test_context_extractor_parity(rng):
    import models.context.context_features as ref_mod

    torch.manual_seed(5)
    tmodel = ref_mod.SimpleContextExtractor(context_dim=64)
    tmodel.eval()
    inputs = [rng.normal(size=(3, 1)).astype(np.float32) for _ in range(4)]
    variables = ck.import_context(to_numpy_state_dict(tmodel), kind="simple")
    model = SimpleContextExtractor(context_dim=64)
    out = model.apply(variables, *[jnp.asarray(v) for v in inputs])
    with torch.no_grad():
        ref = tmodel(*[torch.from_numpy(v) for v in inputs])
    assert_close(out, ref, name="simple context")


def test_policy_parity(image, rng):
    import models.policy.trajectory_head as ref_mod

    torch.manual_seed(6)
    tmodel = ref_mod.TrajectoryPolicy(horizon=10, context_dim=256, backbone_dim=512)
    tmodel.eval()
    ctx = rng.normal(size=(2, 256)).astype(np.float32)
    variables = ck.import_policy(to_numpy_state_dict(tmodel))
    model = TrajectoryPolicy(horizon=10, context_dim=256, backbone_dim=512)
    out = model.apply(variables, jnp.asarray(image), jnp.asarray(ctx))
    with torch.no_grad():
        ref = tmodel(nchw(image), torch.from_numpy(ctx))
    assert_close(out["waypoints"], ref["waypoints"], tol=DEEP_TOL, name="waypoints")
    assert_close(out["speed"], ref["speed"], tol=DEEP_TOL, name="speed")


def test_easy_backbone_parity(image):
    import models.policy.trajectory_head as ref_mod

    torch.manual_seed(7)
    tmodel = ref_mod.EasyBackbone(out_dim=512)
    tmodel.eval()
    sd = {f"backbone.{k}": v for k, v in to_numpy_state_dict(tmodel).items()}
    # reuse policy importer by faking head weights
    zeros = np.zeros((512, 512), np.float32)
    z1 = np.zeros((512,), np.float32)
    for head in ("head_wp", "head_spd"):
        for i, (o, ii) in enumerate([(512, 1024), (512, 512), (20, 512)]):
            sd[f"{head}.{i*2}.weight"] = np.zeros((o, ii), np.float32)
            sd[f"{head}.{i*2}.bias"] = np.zeros((o,), np.float32)
    del zeros, z1
    variables = ck.import_policy(sd)
    model = EasyBackbone(out_dim=512)
    out = model.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.asarray(image),
    )
    with torch.no_grad():
        ref = tmodel(nchw(image))
    assert_close(out, ref, tol=DEEP_TOL, name="easy backbone")


@pytest.mark.parametrize("kind", ["detection", "segmentation", "drivable", "nuscenes"])
def test_extractor_parity(rng, kind):
    import models.experts.expert_extractors as ref_mod

    torch.manual_seed(8)
    B = 2
    if kind == "detection":
        tmodel = ref_mod.DetectionExpertExtractor(output_dim=256, num_classes=10)
        out_t = {
            "class_logits": rng.normal(size=(B, 10, 4, 4)).astype(np.float32),
            "bbox_deltas": rng.normal(size=(B, 4, 4, 4)).astype(np.float32),
        }
        t_in = {k: torch.from_numpy(v) for k, v in out_t.items()}
        j_in = {k: jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for k, v in out_t.items()}
        cfg = ExpertConfig(type=kind, num_classes=10)
    elif kind in ("segmentation", "drivable"):
        n = 19 if kind == "segmentation" else 3
        cls = (
            ref_mod.SegmentationExpertExtractor
            if kind == "segmentation"
            else ref_mod.DrivableExpertExtractor
        )
        tmodel = cls(output_dim=256, num_classes=n)
        arr = rng.normal(size=(B, n, 8, 8)).astype(np.float32)
        t_in = torch.from_numpy(arr)
        j_in = jnp.asarray(np.transpose(arr, (0, 2, 3, 1)))
        cfg = ExpertConfig(type=kind, num_classes=n)
    else:
        tmodel = ref_mod.NuScenesExpertExtractor(
            output_dim=256, num_queries=16, num_classes=10, bbox_dim=4
        )
        out_t = {
            "class_logits": rng.normal(size=(B, 16, 10)).astype(np.float32),
            "bbox_preds": rng.normal(size=(B, 16, 4)).astype(np.float32),
        }
        t_in = {k: torch.from_numpy(v) for k, v in out_t.items()}
        j_in = {k: jnp.asarray(v) for k, v in out_t.items()}
        cfg = ExpertConfig(type=kind, num_classes=10, num_queries=16, bbox_dim=4)

    tmodel.eval()
    variables = ck.import_extractor(to_numpy_state_dict(tmodel), kind)
    model = make_extractor(cfg)
    out = model.apply(variables, j_in)
    with torch.no_grad():
        ref = tmodel(t_in)
    assert_close(out, ref, name=f"extractor {kind}")
