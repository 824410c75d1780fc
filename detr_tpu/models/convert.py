"""torchvision -> flax backbone weight conversion.

The reference backbone loads torchvision ImageNet weights with frozen BN
(reference detr/model.py:432).  This module converts a torchvision
``resnet50``/``resnet101`` ``state_dict`` into this framework's parameter
trees (SURVEY §7 hard part #3):

  * conv kernels OIHW -> HWIO (NHWC layout);
  * BatchNorm weight/bias/running_mean/running_var -> the ``frozen``
    collection's scale/bias/mean/var;
  * ``layerX.Y.*`` -> ``layerX_blockY`` module names, ``downsample.0/1`` ->
    ``downsample_conv`` / ``downsample_bn``.

Since this environment has no torchvision (and no network egress), the
expected workflow is offline: run ``python -m detr_tpu.models.convert
dump.npz`` on a machine with torchvision to produce an .npz, then point
``DETRConfig.backbone_weights`` at it.  ``load_backbone_npz`` ingests the
.npz; ``convert_torch_state_dict`` does the tree mapping from any mapping of
name -> numpy array (tested against a synthetic state_dict with torchvision's
exact naming).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

_STAGES = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _bn(frozen: dict, prefix: str, sd: Mapping[str, np.ndarray], out_name: str):
    frozen[out_name] = {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }


def convert_torch_state_dict(
    sd: Mapping[str, np.ndarray], backbone: str = "resnet50"
) -> tuple[dict, dict]:
    """torchvision resnet state_dict -> (params_tree, frozen_tree) matching

    ``detr_tpu.models.resnet.ResNetBackbone``'s variable structure."""
    blocks = _STAGES[backbone]
    params: dict = {"conv1": {"kernel": _conv_kernel(sd["conv1.weight"])}}
    frozen: dict = {}
    _bn(frozen, "bn1", sd, "bn1")

    for stage, n in enumerate(blocks, start=1):
        for b in range(n):
            name = f"layer{stage}_block{b}"
            tprefix = f"layer{stage}.{b}"
            p: dict = {}
            f: dict = {}
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = {
                    "kernel": _conv_kernel(sd[f"{tprefix}.conv{ci}.weight"])
                }
                _bn(f, f"{tprefix}.bn{ci}", sd, f"bn{ci}")
            if f"{tprefix}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": _conv_kernel(sd[f"{tprefix}.downsample.0.weight"])
                }
                _bn(f, f"{tprefix}.downsample.1", sd, "downsample_bn")
            params[name] = p
            frozen[name] = f
    return params, frozen


def save_backbone_npz(path: str, sd: Mapping[str, np.ndarray], backbone: str) -> None:
    """Flatten the converted trees into one .npz."""
    params, frozen = convert_torch_state_dict(sd, backbone)
    flat: dict[str, np.ndarray] = {}

    def walk(tree, prefix, kind):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key, kind)
            else:
                flat[f"{kind}:{key}"] = v

    walk(params, "", "params")
    walk(frozen, "", "frozen")
    np.savez(path, **flat)


def load_backbone_npz(path: str) -> tuple[dict, dict]:
    """Load an .npz produced by :func:`save_backbone_npz` back into trees."""
    data = np.load(path)
    params: dict = {}
    frozen: dict = {}
    for key in data.files:
        kind, rest = key.split(":", 1)
        tree = params if kind == "params" else frozen
        parts = rest.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return params, frozen


def apply_backbone_weights(variables: dict, params: dict, frozen: dict) -> dict:
    """Graft converted backbone trees into a DETR variables dict."""
    import jax

    new_vars = dict(variables)
    new_params = dict(new_vars["params"])
    new_frozen = dict(new_vars.get("frozen", {}))

    def check_and_cast(dst, src):
        return jax.tree_util.tree_map(
            lambda d, s: np.asarray(s, d.dtype).reshape(d.shape), dst, src
        )

    new_params["backbone"] = check_and_cast(new_params["backbone"], params)
    new_frozen["backbone"] = check_and_cast(new_frozen["backbone"], frozen)
    new_vars["params"] = new_params
    new_vars["frozen"] = new_frozen
    return new_vars


def _main(argv) -> int:  # pragma: no cover — needs torchvision
    """Offline dump: python -m detr_tpu.models.convert out.npz [resnet50]."""
    import torchvision.models as tvm

    out = argv[1]
    backbone = argv[2] if len(argv) > 2 else "resnet50"
    model = tvm.get_model(backbone, weights="DEFAULT")
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    save_backbone_npz(out, sd, backbone)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    sys.exit(_main(sys.argv))
