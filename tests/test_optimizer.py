"""Optimizer regression tests.

The critical one: the LR actually applied by the optimizer must track the
epoch schedule regardless of gradient accumulation (round-1 confirmed bug:
``optax.MultiSteps`` advanced the schedule once per k micro-steps, so the
warmup ran k times too slow).  With the inject-hyperparams design the LR is
state the trainer sets per epoch (reference scheduler.step() semantics,
detr/train.py:288), so accumulation cannot desync it — these tests pin that.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from detr_tpu.config import TrainingConfig
from detr_tpu.train.optimizer import (
    build_optimizer,
    get_learning_rates,
    set_learning_rates,
)


def _config(accum: int, **kw) -> TrainingConfig:
    base = dict(
        train_batch_size=1,
        cumulative_train_batch_size=accum,
        epochs=6,
        lr=1e-2,
        lr_backbone=1e-3,
        lr_warmup_epochs=2,
        lr_warmup_decay=0.01,
        lr_hold_max_epochs=2,
        lr_min=1e-4,
        weight_decay=0.0,
        gradient_max_norm=1e9,
    )
    base.update(kw)
    return TrainingConfig(**base)


def applied_update_trace(accum: int, epochs: int, steps_per_epoch: int):
    """Simulates the trainer: per-epoch set_learning_rates + micro-steps.

    Returns per-epoch max |update| of the 'rest' group — with constant
    gradients Adam's bias-corrected update magnitude is ~= the applied LR."""
    config = _config(accum, epochs=epochs)
    tx, schedules = build_optimizer(config)
    params = {"backbone": jnp.ones((4,)), "head": jnp.ones((4,))}
    opt_state = tx.init(params)
    grads = {"backbone": jnp.full((4,), 0.1), "head": jnp.full((4,), 0.1)}

    per_epoch = []
    for epoch in range(epochs):
        opt_state = set_learning_rates(
            opt_state, {g: float(s(epoch)) for g, s in schedules.items()}
        )
        mags = []
        for _ in range(steps_per_epoch):
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            mags.append(float(jnp.abs(updates["head"]).max()))
        nonzero = [m for m in mags if m > 0]
        assert nonzero, "no optimizer update emitted this epoch"
        per_epoch.append(max(nonzero))
    return per_epoch, schedules


@pytest.mark.parametrize("accum", [1, 4])
def test_applied_lr_tracks_epoch_schedule(accum):
    epochs, steps_per_epoch = 6, 4
    trace, schedules = applied_update_trace(accum, epochs, steps_per_epoch)
    expected = [float(schedules["rest"](e)) for e in range(epochs)]
    np.testing.assert_allclose(trace, expected, rtol=5e-2)


def test_accumulation_does_not_desync_schedule():
    """Warmup->hold crossing happens at the same epoch for accum=1 and 4."""
    epochs, steps_per_epoch = 6, 4
    t1, schedules = applied_update_trace(1, epochs, steps_per_epoch)
    t4, _ = applied_update_trace(4, epochs, steps_per_epoch)
    np.testing.assert_allclose(t1, t4, rtol=5e-2)
    # the schedule actually moves (warmup ends at epoch 2: full LR applied)
    assert t4[2] == pytest.approx(1e-2, rel=5e-2)
    assert t4[0] < 0.6 * t4[2]


def test_set_get_learning_rates_roundtrip():
    tx, _ = build_optimizer(_config(4))
    params = {"backbone": jnp.ones((2,)), "head": jnp.ones((2,))}
    st = tx.init(params)
    st = set_learning_rates(st, {"backbone": 1.5e-4, "rest": 2.5e-3})
    lrs = get_learning_rates(st)
    assert lrs["backbone"] == pytest.approx(1.5e-4)
    assert lrs["rest"] == pytest.approx(2.5e-3)


def test_start_epoch_fast_forward_initializes_lr():
    """Weights-only resume: LR starts at the schedule value for start_epoch
    (reference detr/train.py:238-241)."""
    config = _config(1)
    tx, schedules = build_optimizer(config, start_epoch=3)
    params = {"backbone": jnp.ones((2,)), "head": jnp.ones((2,))}
    st = tx.init(params)
    lrs = get_learning_rates(st)
    assert lrs["rest"] == pytest.approx(float(schedules["rest"](3)))
    assert lrs["backbone"] == pytest.approx(float(schedules["backbone"](3)))


def test_norm_weight_decay_path_rate():
    """norm_weight_decay=0 removes decay from LayerNorm params only."""
    config = _config(1, weight_decay=0.1, norm_weight_decay=0.0)
    tx, schedules = build_optimizer(config)
    params = {
        "head": {
            "norm1": {"scale": jnp.ones((3,))},
            "dense": {"kernel": jnp.ones((3,))},
        }
    }
    st = tx.init(params)
    lr = 1e-2
    st = set_learning_rates(st, {"backbone": lr, "rest": lr})
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, st, params)
    # zero grads: update = -lr * wd * p for decayed leaves, 0 for norm leaves
    np.testing.assert_allclose(updates["head"]["norm1"]["scale"], 0.0, atol=1e-12)
    np.testing.assert_allclose(
        updates["head"]["dense"]["kernel"], -lr * 0.1, rtol=1e-5
    )


def test_default_decays_everything_like_reference():
    """norm_weight_decay=None (default): one rate for every param
    (reference detr/train.py:68 declares the field but never wires it)."""
    config = _config(1, weight_decay=0.1)
    tx, _ = build_optimizer(config)
    params = {"head": {"norm1": {"scale": jnp.ones((3,))}}}
    st = tx.init(params)
    st = set_learning_rates(st, {"backbone": 1e-2, "rest": 1e-2})
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, st, params)
    np.testing.assert_allclose(
        updates["head"]["norm1"]["scale"], -1e-2 * 0.1, rtol=1e-5
    )
