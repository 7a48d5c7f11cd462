"""Torch-side mirror used by the numeric parity tests.

torchvision is not installed in this image, but the reference modules
import it. This file provides (a) an independent torch ResNet-18 matching
torchvision's architecture and module naming, and (b) a `torchvision`
stub module exposing `models.resnet18` and the `ops` box functions, so the
*actual reference code* under /root/reference can be imported and executed
on CPU as the parity oracle.

This is test-only scaffolding — the framework itself never imports torch
for compute.
"""
from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn


class _BasicBlock(nn.Module):
    def __init__(self, inplanes: int, planes: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet18(nn.Module):
    """Attribute order matches torchvision so children()[:-k] slicing and
    state-dict names line up."""

    def __init__(self, num_classes: int = 1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(_BasicBlock(64, 64), _BasicBlock(64, 64))
        self.layer2 = nn.Sequential(_BasicBlock(64, 128, 2), _BasicBlock(128, 128))
        self.layer3 = nn.Sequential(_BasicBlock(128, 256, 2), _BasicBlock(256, 256))
        self.layer4 = nn.Sequential(_BasicBlock(256, 512, 2), _BasicBlock(512, 512))
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def _box_convert(boxes, in_fmt, out_fmt):
    if in_fmt == out_fmt:
        return boxes
    if in_fmt == "xyxy" and out_fmt == "cxcywh":
        x1, y1, x2, y2 = boxes.unbind(-1)
        return torch.stack(
            [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], dim=-1
        )
    if in_fmt == "cxcywh" and out_fmt == "xyxy":
        cx, cy, w, h = boxes.unbind(-1)
        return torch.stack(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], dim=-1
        )
    raise ValueError(f"{in_fmt}->{out_fmt}")


def _box_area(b):
    return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])


def _box_iou(b1, b2):
    lt = torch.max(b1[:, None, :2], b2[None, :, :2])
    rb = torch.min(b1[:, None, 2:], b2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = _box_area(b1)[:, None] + _box_area(b2)[None, :] - inter
    return inter / union.clamp(min=1e-9)


def _generalized_box_iou(b1, b2):
    lt_i = torch.max(b1[:, None, :2], b2[None, :, :2])
    rb_i = torch.min(b1[:, None, 2:], b2[None, :, 2:])
    wh_i = (rb_i - lt_i).clamp(min=0)
    inter = wh_i[..., 0] * wh_i[..., 1]
    union = _box_area(b1)[:, None] + _box_area(b2)[None, :] - inter
    iou = inter / union.clamp(min=1e-9)
    lt = torch.min(b1[:, None, :2], b2[None, :, :2])
    rb = torch.max(b1[:, None, 2:], b2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / hull.clamp(min=1e-9)


def install_torchvision_stub() -> None:
    """Install a minimal `torchvision` into sys.modules (idempotent)."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    ops = types.ModuleType("torchvision.ops")

    def resnet18(pretrained: bool = False, **kw):
        del pretrained  # no weights available offline; random init
        torch.manual_seed(0)
        return TorchResNet18()

    io_mod = types.ModuleType("torchvision.io")

    def read_image(path, mode=None):
        # torchvision semantics: uint8 CHW tensor
        import numpy as np
        from PIL import Image

        with Image.open(path) as im:
            if mode == "GRAY":
                arr = np.asarray(im.convert("L"))[None, :, :]
            else:
                arr = np.transpose(np.asarray(im.convert("RGB")), (2, 0, 1))
        return torch.from_numpy(arr.copy())

    io_mod.read_image = read_image
    io_mod.ImageReadMode = types.SimpleNamespace(RGB="RGB", GRAY="GRAY")

    # minimal transforms namespace (import-time only for the reference's
    # inference module; tests never execute the PIL pipeline)
    transforms = types.ModuleType("torchvision.transforms")

    class _Identity:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class _Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    for name in ("ToPILImage", "Resize", "ToTensor", "Normalize"):
        setattr(transforms, name, _Identity)
    transforms.Compose = _Compose
    transforms.InterpolationMode = types.SimpleNamespace(BILINEAR="bilinear")
    tv_transforms = transforms

    models.resnet18 = resnet18
    ops.box_convert = _box_convert
    ops.box_iou = _box_iou
    ops.generalized_box_iou = _generalized_box_iou
    tv.models = models
    tv.ops = ops
    tv.io = io_mod
    tv.transforms = tv_transforms
    tv.__path__ = []  # mark as package so `import torchvision.x` resolves
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.io"] = io_mod
    sys.modules["torchvision.transforms"] = tv_transforms


def add_reference_to_path() -> None:
    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.insert(0, ref)


class FakeQuat:
    """Picklable quaternion stand-in with yaw_pitch_roll."""

    def __init__(self, yaw):
        self.yaw_pitch_roll = (yaw, 0.0, 0.0)


class FakeBox:
    """Picklable nuScenes-devkit Box stand-in (center/wlh/orientation/name)."""

    def __init__(self, center, wlh, yaw, name):
        self.center = center
        self.wlh = wlh
        self.name = name
        self.orientation = FakeQuat(yaw)
