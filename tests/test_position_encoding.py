"""Positional-encoding tests.

Two layers of verification (SURVEY §4 implication (a)/(b)):
  1. closed-form/numpy re-derivation of the documented formula;
  2. golden parity against the actual reference implementation
     (/root/reference/detr/position_encoding.py), imported at test time when
     available — it only depends on torch, which is installed.
"""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

from detr_tpu.ops.position_encoding import (
    batch_positional_encoding,
    positional_encoding,
    scaled_valid_extent,
    sine_position_embedding,
)

REF = "/root/reference/detr/position_encoding.py"


def np_positional_encoding(gx, gy, num_pos_feats=128, temperature=10000.0):
    """Independent numpy re-derivation of the reference formula
    (reference position_encoding.py:5-54), channels-last."""
    scale = 2 * np.pi
    dim_t = temperature ** (
        np.arange(0, num_pos_feats, 2, dtype=np.float32) / num_pos_feats
    )

    def embed(c):
        phase = (c * scale)[..., None] / dim_t
        out = np.stack([np.sin(phase), np.cos(phase)], axis=-1)
        return out.reshape(*phase.shape[:-1], num_pos_feats)

    return np.concatenate([embed(gy), embed(gx)], axis=-1)


def test_matches_numpy_formula(rng):
    gx = rng.uniform(0, 1, (2, 5, 7)).astype(np.float32)
    gy = rng.uniform(0, 1, (2, 5, 7)).astype(np.float32)
    ours = np.asarray(positional_encoding(jnp.asarray(gx), jnp.asarray(gy)))
    ref = np_positional_encoding(gx, gy)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_interleaving_layout():
    # Channel 2k is sin, 2k+1 is cos of the same frequency; first half is y.
    gx = jnp.full((1, 1, 1), 0.25)
    gy = jnp.zeros((1, 1, 1))
    out = np.asarray(positional_encoding(gx, gy, num_pos_feats=4))
    # y block: coord 0 -> [sin 0, cos 0, sin 0, cos 0] = [0, 1, 0, 1]
    np.testing.assert_allclose(out[0, 0, 0, :4], [0, 1, 0, 1], atol=1e-6)
    # x block: phase = 0.25*2pi = pi/2 at frequency t^0
    np.testing.assert_allclose(out[0, 0, 0, 4:6], [1, 0], atol=1e-6)


def test_batch_grids_zero_on_padding():
    h, w = 6, 8
    out = np.asarray(
        batch_positional_encoding(
            h, w, jnp.array([4, 6]), jnp.array([5, 8]), num_pos_feats=8
        )
    )
    assert out.shape == (2, h, w, 16)
    # Padded cells carry the coord-0 embedding: sin=0, cos=1 interleaved.
    pad_cell = out[0, 5, 7]
    np.testing.assert_allclose(pad_cell[0::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(pad_cell[1::2], 1.0, atol=1e-6)
    # Right edge of the valid region reaches coordinate 1.0 -> phase 2pi at
    # the base frequency: sin ~ 0, cos ~ 1 on the first x channel pair.
    edge = out[1, 0, 7]  # image 1 has full width 8, col 7 = linspace end = 1.0
    np.testing.assert_allclose(edge[8], 0.0, atol=1e-5)
    np.testing.assert_allclose(edge[9], 1.0, atol=1e-5)


def test_scaled_extent_ceil():
    assert np.asarray(scaled_valid_extent(jnp.array([800, 801, 32, 1]), 32)).tolist() == [
        25,
        26,
        1,
        1,
    ]


@pytest.mark.skipif(not os.path.exists(REF), reason="reference repo not mounted")
def test_golden_vs_reference_torch():
    import torch

    spec = importlib.util.spec_from_file_location("ref_posenc", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    feat_h, feat_w = 7, 9
    heights = [200, 224, 65]
    widths = [256, 199, 288]
    module = ref.PositionalEncoding(num_pos_feats=128, temperature=10000)
    ref_out = module(
        feat_h,
        feat_w,
        torch.tensor(heights),
        torch.tensor(widths),
        scaling_factor=32,
    )  # (B, 256, H, W) NCHW
    ref_np = ref_out.permute(0, 2, 3, 1).numpy()

    ours = np.asarray(
        sine_position_embedding(
            feat_h,
            feat_w,
            jnp.array(heights),
            jnp.array(widths),
            stride=32,
        )
    )
    np.testing.assert_allclose(ours, ref_np, atol=5e-5)
