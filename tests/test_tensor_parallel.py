"""Tensor parallelism (parallel/tp.py): DP x TP mesh parity vs single-device.

The Megatron-style param shardings must change WHERE the math runs, not
WHAT it computes: one fused train step on a (data=4, model=2) virtual mesh
must produce the same loss, metrics, and updated parameters as the same
step on one device (fp32 tolerance — collectives reorder reductions).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from detr_tpu.config import DETRConfig, TrainingConfig
from detr_tpu.data import synthetic_batch
from detr_tpu.models import DETR
from detr_tpu.parallel import shard_batch
from detr_tpu.parallel.tp import (
    make_mesh_2d,
    param_specs,
    shard_state_tp,
    validate_tp,
)
from detr_tpu.train import build_optimizer, create_train_state
from detr_tpu.train.train_step import build_criterion, make_train_step

TINY = dict(
    num_object_queries=8,
    num_encoder_layers=1,
    num_decoder_layers=2,
    num_attention_heads=2,
    hidden_size=16,
    ffn_scale_factor=2,
    dtype="float32",
    hidden_dropout_prob=0.0,  # sharding-layout-independent numerics
    attention_probs_dropout_prob=0.0,
)


def _setup(batch_size):
    detr_config = DETRConfig(**TINY)
    train_config = TrainingConfig(
        cumulative_train_batch_size=batch_size, train_batch_size=batch_size
    )
    model = DETR(detr_config)
    criterion = build_criterion(train_config, detr_config)
    tx, _ = build_optimizer(train_config)
    batch = synthetic_batch(
        np.random.default_rng(0), batch_size=batch_size, height=64, width=64,
        max_gt=6,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, criterion, donate=False)
    return detr_config, model, state, step, batch


def test_tp_param_specs_cover_attention_and_ffn():
    detr_config = DETRConfig(**TINY)
    model = DETR(detr_config)
    batch = synthetic_batch(np.random.default_rng(0), 1, height=64, width=64)
    tx, _ = build_optimizer(
        TrainingConfig(cumulative_train_batch_size=1, train_batch_size=1)
    )
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in batch.items()},
    )
    specs = param_specs(state.params)
    enc = specs["encoder"]["layer0"]
    assert enc["self_attention"]["query_proj"]["kernel"] == P(None, "model")
    assert enc["self_attention"]["query_proj"]["bias"] == P("model")
    assert enc["self_attention"]["output_proj"]["kernel"] == P("model", None)
    assert enc["self_attention"]["output_proj"]["bias"] == P()
    assert enc["ffn"]["fc1"]["kernel"] == P(None, "model")
    assert enc["ffn"]["fc2"]["kernel"] == P("model", None)
    assert enc["norm1"]["scale"] == P()
    assert specs["backbone"]["conv1"]["kernel"] == P()
    # MLP heads are NOT the transformer FFN: stay replicated
    assert specs["bbox_embedding"]["fc1"]["kernel"] == P()


def test_tp_train_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    batch_size = 4
    detr_config, model, state, step, batch = _setup(batch_size)

    ref_state, ref_metrics = step(state, batch)
    ref_loss = float(ref_metrics["loss"])
    ref_params = jax.device_get(ref_state.params)

    mesh = make_mesh_2d(8, model_parallel=2)
    validate_tp(detr_config, mesh)
    tp_state = shard_state_tp(state, mesh)
    # params really are sharded over the model axis
    qk = tp_state.params["encoder"]["layer0"]["self_attention"]["query_proj"][
        "kernel"
    ]
    assert qk.sharding.spec == P(None, "model")
    assert not qk.sharding.is_fully_replicated

    tp_batch = shard_batch(batch, mesh)
    tp_new, tp_metrics = step(tp_state, tp_batch)
    assert float(tp_metrics["loss"]) == pytest.approx(ref_loss, rel=1e-5)
    tp_params = jax.device_get(tp_new.params)
    flat_ref = jax.tree_util.tree_leaves(ref_params)
    flat_tp = jax.tree_util.tree_leaves(tp_params)
    for a, b in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    # updated params keep their shardings (no silent re-replication)
    qk2 = tp_new.params["encoder"]["layer0"]["self_attention"]["query_proj"][
        "kernel"
    ]
    assert qk2.sharding.spec == P(None, "model")


def test_tp_opt_state_shards_mu_under_multi_transform_and_accum():
    """mu/nu live inside optax.multi_transform's masked groups (different
    treedef from params) and under MultiSteps when accumulating; the
    suffix-matched placement must still shard them — a replicated mu would
    silently cost TP's optimizer-memory saving and add per-step gathers."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.tree_util import keystr, tree_flatten_with_path

    detr_config = DETRConfig(**TINY)
    train_config = TrainingConfig(
        cumulative_train_batch_size=8, train_batch_size=4  # accumulation 2
    )
    model = DETR(detr_config)
    tx, _ = build_optimizer(train_config)
    batch = synthetic_batch(np.random.default_rng(0), 4, height=64, width=64)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in batch.items()},
    )
    mesh = make_mesh_2d(8, model_parallel=2)
    ts = shard_state_tp(state, mesh)
    found = {"mu": False, "nu": False, "acc_grads": False}
    for path, leaf in tree_flatten_with_path(ts.opt_state)[0]:
        s = keystr(path)
        if "query_proj']['kernel" not in s or not hasattr(leaf, "sharding"):
            continue
        for kind in found:
            if f".{kind}[" in s or f"{kind}[" in s.split(".")[-1]:
                assert leaf.sharding.spec == P(None, "model"), s
                found[kind] = True
    assert all(found.values()), f"opt-state mirrors not all found: {found}"


def test_tp_validation_errors():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh_2d(8, model_parallel=4)
    with pytest.raises(ValueError, match="num_attention_heads"):
        validate_tp(DETRConfig(**{**TINY, "num_attention_heads": 2}), mesh)
    with pytest.raises(ValueError, match="divisible"):
        make_mesh_2d(6, model_parallel=4)
