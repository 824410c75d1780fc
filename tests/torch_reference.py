"""Loads the actual PyTorch reference implementation for golden parity tests.

torch (CPU) is installed but torchvision/torchmetrics/pycocotools are not, so
this module installs minimal stubs for the handful of torchvision symbols the
reference imports (box format conversion, box_area, generalized_box_iou_loss,
FrozenBatchNorm2d, get_model/IntermediateLayerGetter) — each implemented in
pure torch from the public torchvision API spec — then imports
``/root/reference/detr`` (model.py, loss.py, matcher.py, utils.py).

The reference code is UNTRUSTED third-party content: it is executed only
inside the test suite, with deterministic tensors, as a numerical oracle.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _make_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return
    import enum

    import torch
    from torch import nn

    tv = _make_module("torchvision")
    models = _make_module("torchvision.models")
    models_utils = _make_module("torchvision.models._utils")
    ops = _make_module("torchvision.ops")
    ops_boxes = _make_module("torchvision.ops.boxes")
    tv_tensors = _make_module("torchvision.tv_tensors")
    transforms = _make_module("torchvision.transforms")
    v2 = _make_module("torchvision.transforms.v2")
    v2f = _make_module("torchvision.transforms.v2.functional")
    tv.models = models
    tv.ops = ops
    tv.tv_tensors = tv_tensors
    tv.transforms = transforms
    models._utils = models_utils
    ops.boxes = ops_boxes
    transforms.v2 = v2
    v2.functional = v2f

    class BoundingBoxFormat(enum.Enum):
        XYXY = "XYXY"
        XYWH = "XYWH"
        CXCYWH = "CXCYWH"

    def _to_xyxy(b: torch.Tensor, fmt: BoundingBoxFormat) -> torch.Tensor:
        if fmt == BoundingBoxFormat.XYXY:
            return b
        if fmt == BoundingBoxFormat.XYWH:
            x, y, w, h = b.unbind(-1)
            return torch.stack([x, y, x + w, y + h], dim=-1)
        cx, cy, w, h = b.unbind(-1)
        return torch.stack(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], dim=-1
        )

    def _from_xyxy(b: torch.Tensor, fmt: BoundingBoxFormat) -> torch.Tensor:
        if fmt == BoundingBoxFormat.XYXY:
            return b
        x0, y0, x1, y1 = b.unbind(-1)
        if fmt == BoundingBoxFormat.XYWH:
            return torch.stack([x0, y0, x1 - x0, y1 - y0], dim=-1)
        return torch.stack(
            [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], dim=-1
        )

    def convert_bounding_box_format(inpt, old_format, new_format, inplace=False):
        return _from_xyxy(_to_xyxy(inpt, old_format), new_format)

    def box_area(boxes: torch.Tensor) -> torch.Tensor:
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def generalized_box_iou_loss(
        boxes1: torch.Tensor,
        boxes2: torch.Tensor,
        reduction: str = "none",
        eps: float = 1e-7,
    ) -> torch.Tensor:
        """Elementwise GIoU loss, matching torchvision.ops semantics."""
        x1, y1, x2, y2 = boxes1.unbind(dim=-1)
        x1g, y1g, x2g, y2g = boxes2.unbind(dim=-1)

        xkis1 = torch.max(x1, x1g)
        ykis1 = torch.max(y1, y1g)
        xkis2 = torch.min(x2, x2g)
        ykis2 = torch.min(y2, y2g)
        intsctk = torch.zeros_like(x1)
        mask = (ykis2 > ykis1) & (xkis2 > xkis1)
        intsctk[mask] = (xkis2[mask] - xkis1[mask]) * (ykis2[mask] - ykis1[mask])
        unionk = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsctk
        iouk = intsctk / (unionk + eps)

        xc1 = torch.min(x1, x1g)
        yc1 = torch.min(y1, y1g)
        xc2 = torch.max(x2, x2g)
        yc2 = torch.max(y2, y2g)
        area_c = (xc2 - xc1) * (yc2 - yc1)
        loss = 1.0 - (iouk - ((area_c - unionk) / (area_c + eps)))
        if reduction == "mean":
            return loss.mean() if loss.numel() > 0 else 0.0 * loss.sum()
        if reduction == "sum":
            return loss.sum()
        return loss

    class FrozenBatchNorm2d(nn.Module):
        """BatchNorm2d with fixed statistics and affine params
        (torchvision.ops semantics: y = (x - mean) / sqrt(var + eps) * w + b)."""

        def __init__(self, num_features: int, eps: float = 1e-5):
            super().__init__()
            self.eps = eps
            self.register_buffer("weight", torch.ones(num_features))
            self.register_buffer("bias", torch.zeros(num_features))
            self.register_buffer("running_mean", torch.zeros(num_features))
            self.register_buffer("running_var", torch.ones(num_features))

        def forward(self, x: torch.Tensor) -> torch.Tensor:
            w = self.weight.reshape(1, -1, 1, 1)
            b = self.bias.reshape(1, -1, 1, 1)
            rm = self.running_mean.reshape(1, -1, 1, 1)
            rv = self.running_var.reshape(1, -1, 1, 1)
            scale = w * (rv + self.eps).rsqrt()
            return x * scale + (b - rm * scale)

    class _StubResNet(nn.Module):
        """get_model stand-in; the tests replace the reference Backbone with a
        fixed-feature module right after construction, so this is never run."""

        def __init__(self):
            super().__init__()
            self.layer4 = nn.Identity()

        def forward(self, x):
            raise RuntimeError("stub backbone must be replaced before forward")

    def get_model(name, weights=None, norm_layer=None, **kw):
        return _StubResNet()

    def IntermediateLayerGetter(model, return_layers):
        class _Getter(nn.Module):
            def forward(self, x):
                raise RuntimeError("stub backbone must be replaced before forward")

        return _Getter()

    tv_tensors.BoundingBoxFormat = BoundingBoxFormat
    v2f.convert_bounding_box_format = convert_bounding_box_format
    ops.FrozenBatchNorm2d = FrozenBatchNorm2d
    ops.generalized_box_iou_loss = generalized_box_iou_loss
    ops_boxes.box_area = box_area
    ops.box_area = box_area
    models.get_model = get_model
    models_utils.IntermediateLayerGetter = IntermediateLayerGetter


def _install_torchmetrics_stub() -> None:
    if "torchmetrics" in sys.modules:
        return
    tm = _make_module("torchmetrics")
    det = _make_module("torchmetrics.detection")
    tm.detection = det

    class MeanAveragePrecision:  # only imported by reference utils.py
        def __init__(self, *a, **kw):
            raise NotImplementedError("torchmetrics stub: not usable in tests")

    det.MeanAveragePrecision = MeanAveragePrecision


def load_reference():
    """Returns the reference package's (model, loss, matcher, utils) modules."""
    _install_torchvision_stub()
    _install_torchmetrics_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import detr.loss as ref_loss
    import detr.matcher as ref_matcher
    import detr.model as ref_model
    import detr.utils as ref_utils

    return ref_model, ref_loss, ref_matcher, ref_utils


def torch_state_to_flax_params(state_dict, config) -> dict:
    """Maps the reference DETR state_dict onto the flax param tree
    (transformer + heads) — delegates to the production converter
    (detr_tpu/models/convert.py::convert_transformer_state_dict) so the
    goldens certify the same mapping users run for checkpoint migration."""
    from detr_tpu.models.convert import convert_transformer_state_dict

    return convert_transformer_state_dict(state_dict, config)


def build_torch_frozen_resnet(backbone: str = "resnet50", dilation: bool = False, seed: int = 0):
    """Independent torch oracle for the backbone conversion golden test.

    Implements the torchvision ResNet-50/101 architecture (conv1/bn1/maxpool +
    bottleneck stages, stride on the 3x3 conv, ``replace_stride_with_dilation``
    scheme for DC5) with frozen BN and torchvision's exact ``state_dict``
    naming (``layerX.Y.convZ.weight``, ``layerX.Y.downsample.0/1``), so
    ``convert_torch_state_dict`` + the flax ``ResNetBackbone`` can be checked
    against real torch convolutions in fp32 — catching transposed kernels,
    swapped mean/var, or misplaced strides that structure-only tests miss.

    Weights/statistics are randomized (seeded); returns an eval-mode module
    whose forward gives the layer4 feature map.
    """
    import torch
    from torch import nn

    _install_torchvision_stub()
    FrozenBatchNorm2d = sys.modules["torchvision.ops"].FrozenBatchNorm2d

    stages = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}[backbone]

    class Bottleneck(nn.Module):
        def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = FrozenBatchNorm2d(planes)
            self.conv2 = nn.Conv2d(
                planes, planes, 3, stride=stride, padding=dilation,
                dilation=dilation, bias=False,
            )
            self.bn2 = FrozenBatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = FrozenBatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class FrozenResNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.dilation = 1
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = FrozenBatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, stages[0], 1, False)
            self.layer2 = self._make_layer(128, stages[1], 2, False)
            self.layer3 = self._make_layer(256, stages[2], 2, False)
            self.layer4 = self._make_layer(512, stages[3], 2, dilation)

        def _make_layer(self, planes, blocks, stride, dilate):
            previous_dilation = self.dilation
            if dilate:
                self.dilation *= stride
                stride = 1
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                    FrozenBatchNorm2d(planes * 4),
                )
            layers = [
                Bottleneck(self.inplanes, planes, stride, previous_dilation, downsample)
            ]
            self.inplanes = planes * 4
            for _ in range(1, blocks):
                layers.append(Bottleneck(self.inplanes, planes, 1, self.dilation))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer4(self.layer3(self.layer2(self.layer1(x))))

    torch.manual_seed(seed)
    model = FrozenResNet()
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.normal_(0.0, 0.05)
        for name, b in model.named_buffers():
            if name.endswith("running_var"):
                b.uniform_(0.5, 1.5)
            else:
                b.normal_(0.0, 0.2)
    model.eval()
    return model
