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


def _graft_leaf(d, s):
    """Cast a converted leaf to the model leaf's dtype, asserting EXACT
    shape: a same-size wrong-shape leaf (e.g. a transposed Dense kernel
    from a mapping bug) must fail here, not reshape-"succeed" into a model
    that predicts garbage."""
    s = np.asarray(s, d.dtype)
    if s.shape != d.shape:
        raise ValueError(
            f"converted leaf shape {s.shape} != model leaf {d.shape}"
        )
    return s


def apply_backbone_weights(variables: dict, params: dict, frozen: dict) -> dict:
    """Graft converted backbone trees into a DETR variables dict."""
    import jax

    new_vars = dict(variables)
    new_params = dict(new_vars["params"])
    new_frozen = dict(new_vars.get("frozen", {}))

    def check_and_cast(dst, src):
        return jax.tree_util.tree_map(_graft_leaf, dst, src)

    new_params["backbone"] = check_and_cast(new_params["backbone"], params)
    new_frozen["backbone"] = check_and_cast(new_frozen["backbone"], frozen)
    new_vars["params"] = new_params
    new_vars["frozen"] = new_frozen
    return new_vars


def _np(v) -> np.ndarray:
    """torch tensor or array-like -> fp32 numpy (torch optional)."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def convert_transformer_state_dict(sd: Mapping, config) -> dict:
    """Reference transformer+heads state_dict slice -> flax param tree.

    Maps the reference's non-backbone modules (detr/model.py:36-48:
    ``input_proj`` 1x1 conv, ``object_query_embedding``, pre-LN
    encoder/decoder stacks, shared class/bbox heads) onto
    ``detr_tpu.models.detr.DETR``'s parameter structure: torch
    ``Linear.weight`` transposes to the Dense kernel, the 1x1 conv
    collapses to a Dense, the reference's ``Sequential`` FFN/MLP indices
    (Linear @0/@3, ``net.{0,2,4}``) become ``fc1/fc2`` / ``fc{i}``.
    """

    def dense(prefix):
        return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}

    def attention(prefix):
        return {
            "query_proj": dense(f"{prefix}.query_proj"),
            "key_proj": dense(f"{prefix}.key_proj"),
            "value_proj": dense(f"{prefix}.value_proj"),
            "output_proj": dense(f"{prefix}.output_proj"),
        }

    def ffn(prefix):
        # reference FFN is a Sequential: Linear @0, GELU, Dropout, Linear @3
        return {"fc1": dense(f"{prefix}.layers.0"), "fc2": dense(f"{prefix}.layers.3")}

    params: dict = {
        # 1x1 conv (out, in, 1, 1) -> Dense kernel (in, out)
        "input_proj": {
            "kernel": _np(sd["input_proj.weight"])[:, :, 0, 0].T,
            "bias": _np(sd["input_proj.bias"]),
        },
        "object_query_embedding": _np(sd["object_query_embedding.weight"]),
        "class_embedding": dense("class_embedding"),
        "bbox_embedding": {
            # reference MLP is a Sequential with GELUs between Linears
            f"fc{i}": dense(f"bbox_embedding.net.{2 * i}")
            for i in range(config.box_embedding_mlp_num_layers)
        },
    }

    encoder: dict = {"norm": ln("encoder.norm")}
    for i in range(config.num_encoder_layers):
        p = f"encoder.layers.{i}"
        encoder[f"layer{i}"] = {
            "norm1": ln(f"{p}.norm1"),
            "norm2": ln(f"{p}.norm2"),
            "self_attention": attention(f"{p}.self_attention"),
            "ffn": ffn(f"{p}.ffn"),
        }
    params["encoder"] = encoder

    decoder: dict = {"norm": ln("decoder.norm")}
    for i in range(config.num_decoder_layers):
        p = f"decoder.layers.{i}"
        decoder[f"layer{i}"] = {
            "norm1": ln(f"{p}.norm1"),
            "norm2": ln(f"{p}.norm2"),
            "norm3": ln(f"{p}.norm3"),
            "self_attention": attention(f"{p}.self_attention"),
            "cross_attention": attention(f"{p}.cross_attention"),
            "ffn": ffn(f"{p}.ffn"),
        }
    params["decoder"] = decoder
    return params


def convert_detr_state_dict(sd: Mapping, config) -> tuple[dict, dict]:
    """FULL reference DETR checkpoint -> (params, frozen) flax trees.

    ``sd`` is the reference model's complete ``state_dict`` — e.g. the
    ``model.safetensors`` that ``accelerator.save_state()`` writes
    (reference detr/train.py:286) or the weights-only resume file it loads
    (train.py:224).  Backbone keys arrive under the reference's
    ``backbone.backbone.`` prefix (Backbone wraps an
    ``IntermediateLayerGetter``, detr/model.py:433); they are stripped and
    routed through :func:`convert_torch_state_dict`, everything else
    through :func:`convert_transformer_state_dict`.  Lets a reference
    user bring their trained weights along when switching frameworks.
    """
    bb_prefix = "backbone.backbone."
    bb_sd = {
        k[len(bb_prefix):]: _np(v) for k, v in sd.items() if k.startswith(bb_prefix)
    }
    bb_params, bb_frozen = convert_torch_state_dict(bb_sd, config.backbone)
    params = convert_transformer_state_dict(sd, config)
    params["backbone"] = bb_params
    return params, {"backbone": bb_frozen}


def load_reference_checkpoint(path: str, config) -> tuple[dict, dict]:
    """Read a reference ``model.safetensors`` -> (params, frozen) trees."""
    from safetensors import safe_open

    with safe_open(path, framework="np") as f:
        sd = {k: f.get_tensor(k) for k in f.keys()}
    return convert_detr_state_dict(sd, config)


def export_detr_state_dict(params: Mapping, frozen: Mapping, config) -> dict:
    """Inverse of :func:`convert_detr_state_dict`: flax trees -> a
    reference-format ``state_dict`` of fp32 numpy arrays.

    Produces exactly the key layout the reference saves/loads
    (detr/model.py module naming; ``backbone.backbone.*`` for the
    IntermediateLayerGetter-wrapped resnet; frozen-BN statistics as the
    ``weight/bias/running_mean/running_var`` buffers safetensors
    serializes) — so a model trained HERE can be handed back to a
    reference user.  Transitively certified against real torch naming by
    the import goldens plus the roundtrip test (tests/test_convert_full.py).
    """
    sd: dict = {}

    def dense(prefix, tree):
        sd[f"{prefix}.weight"] = _np(tree["kernel"]).T
        sd[f"{prefix}.bias"] = _np(tree["bias"])

    def ln(prefix, tree):
        sd[f"{prefix}.weight"] = _np(tree["scale"])
        sd[f"{prefix}.bias"] = _np(tree["bias"])

    def attention(prefix, tree):
        for name in ("query_proj", "key_proj", "value_proj", "output_proj"):
            dense(f"{prefix}.{name}", tree[name])

    def ffn(prefix, tree):
        dense(f"{prefix}.layers.0", tree["fc1"])
        dense(f"{prefix}.layers.3", tree["fc2"])

    # -- transformer + heads (reference detr/model.py:36-48 naming) --
    k = _np(params["input_proj"]["kernel"])  # Dense (in, out) -> conv OIHW
    sd["input_proj.weight"] = k.T[:, :, None, None]
    sd["input_proj.bias"] = _np(params["input_proj"]["bias"])
    sd["object_query_embedding.weight"] = _np(params["object_query_embedding"])
    dense("class_embedding", params["class_embedding"])
    for i in range(config.box_embedding_mlp_num_layers):
        dense(f"bbox_embedding.net.{2 * i}", params["bbox_embedding"][f"fc{i}"])

    ln("encoder.norm", params["encoder"]["norm"])
    for i in range(config.num_encoder_layers):
        layer = params["encoder"][f"layer{i}"]
        p = f"encoder.layers.{i}"
        ln(f"{p}.norm1", layer["norm1"])
        ln(f"{p}.norm2", layer["norm2"])
        attention(f"{p}.self_attention", layer["self_attention"])
        ffn(f"{p}.ffn", layer["ffn"])

    ln("decoder.norm", params["decoder"]["norm"])
    for i in range(config.num_decoder_layers):
        layer = params["decoder"][f"layer{i}"]
        p = f"decoder.layers.{i}"
        ln(f"{p}.norm1", layer["norm1"])
        ln(f"{p}.norm2", layer["norm2"])
        ln(f"{p}.norm3", layer["norm3"])
        attention(f"{p}.self_attention", layer["self_attention"])
        attention(f"{p}.cross_attention", layer["cross_attention"])
        ffn(f"{p}.ffn", layer["ffn"])

    # -- backbone (torchvision naming under backbone.backbone.) --
    bb = "backbone.backbone"
    bb_params, bb_frozen = params["backbone"], frozen["backbone"]

    def conv(prefix, tree):
        # flax HWIO -> torch OIHW
        sd[f"{prefix}.weight"] = np.transpose(_np(tree["kernel"]), (3, 2, 0, 1))

    def bn(prefix, tree):
        sd[f"{prefix}.weight"] = _np(tree["scale"])
        sd[f"{prefix}.bias"] = _np(tree["bias"])
        sd[f"{prefix}.running_mean"] = _np(tree["mean"])
        sd[f"{prefix}.running_var"] = _np(tree["var"])

    conv(f"{bb}.conv1", bb_params["conv1"])
    bn(f"{bb}.bn1", bb_frozen["bn1"])
    for stage, n in enumerate(_STAGES[config.backbone], start=1):
        for b in range(n):
            name = f"layer{stage}_block{b}"
            tprefix = f"{bb}.layer{stage}.{b}"
            for ci in (1, 2, 3):
                conv(f"{tprefix}.conv{ci}", bb_params[name][f"conv{ci}"])
                bn(f"{tprefix}.bn{ci}", bb_frozen[name][f"bn{ci}"])
            if "downsample_conv" in bb_params[name]:
                conv(f"{tprefix}.downsample.0", bb_params[name]["downsample_conv"])
                bn(f"{tprefix}.downsample.1", bb_frozen[name]["downsample_bn"])
    return sd


def save_reference_checkpoint(path: str, params: Mapping, frozen: Mapping, config) -> None:
    """Write flax variables as a reference-loadable ``model.safetensors``
    (the weights-only resume format, reference detr/train.py:224)."""
    from safetensors.numpy import save_file

    save_file(export_detr_state_dict(params, frozen, config), path)


def apply_detr_weights(variables: dict, params: dict, frozen: dict) -> dict:
    """Graft a converted full-model tree into a DETR variables dict,

    asserting structural/shape agreement with the initialized model and
    preserving each leaf's dtype (params may be bf16 under
    ``DETRConfig.dtype``; conversion output is fp32)."""
    import jax

    def check_and_cast(dst, src):
        return jax.tree_util.tree_map(_graft_leaf, dst, src)

    new_vars = dict(variables)
    new_vars["params"] = check_and_cast(new_vars["params"], params)
    new_vars["frozen"] = check_and_cast(new_vars["frozen"], frozen)
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
