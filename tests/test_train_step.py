"""Train-step tests: the fused step runs, updates params, respects gradient

accumulation, and compiles/executes over a multi-device data-parallel mesh
(8 virtual CPU devices, SURVEY §4 implication (d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detr_tpu.config import DETRConfig, TrainingConfig
from detr_tpu.data import synthetic_batch
from detr_tpu.models import DETR
from detr_tpu.parallel import make_mesh, shard_batch, shard_state
from detr_tpu.train import build_optimizer, create_train_state, make_train_step
from detr_tpu.train.train_step import build_criterion

TINY = DETRConfig(
    num_object_queries=8,
    num_encoder_layers=1,
    num_decoder_layers=2,
    num_attention_heads=2,
    hidden_size=16,
    ffn_scale_factor=2,
    num_classes=7,
    dtype="float32",
)


def make_setup(accum_batches=1, batch_size=2, config=TINY):
    tc = TrainingConfig(
        cumulative_train_batch_size=batch_size * accum_batches,
        train_batch_size=batch_size,
        epochs=10,
        lr_warmup_epochs=1,
        lr_hold_max_epochs=2,
    )
    model = DETR(config)
    criterion = build_criterion(tc, config)
    tx, _ = build_optimizer(tc)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, batch_size, 64, 64, max_gt=5, num_classes=7)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, criterion, donate=False)
    return state, step, batch


def test_train_step_runs_and_updates():
    state, step, batch = make_setup()
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(new_state.params),
        )
    )
    assert changed
    # reference loss-dict keys present (train.py:262 sums loss*)
    for key in ("loss_label_ce", "loss_l1_bbox", "loss_giou", "class_error"):
        assert key in metrics


def test_gradient_accumulation_defers_updates():
    state, step, batch = make_setup(accum_batches=3)
    s1, _ = step(state, batch)
    # after 1 of 3 micro-steps params must be unchanged
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(s1.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s2, _ = step(s1, batch)
    s3, _ = step(s2, batch)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(s3.params),
        )
    )
    assert changed


def test_loss_decreases_on_repeated_batch():
    # Dropout off: with it on, 8 tiny steps are dominated by mask noise and
    # the assertion is a coin flip on the RNG stream.
    import dataclasses

    cfg = dataclasses.replace(
        TINY, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0
    )
    state, step, batch = make_setup(config=cfg)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_multi_device_validation_parity():
    """run_validation over an 8-device mesh must reproduce the un-meshed
    run exactly (loss dict and mAP) — the reference's eval is explicitly
    single-process (detr/train.py:367); ours is mesh-aware."""
    from detr_tpu.train.train_step import make_eval_step
    from detr_tpu.train.trainer import run_validation

    assert jax.device_count() >= 8
    state, _, _ = make_setup(batch_size=8)
    model = DETR(TINY)
    tc = TrainingConfig(cumulative_train_batch_size=8, train_batch_size=8)
    criterion = build_criterion(tc, TINY)
    eval_step = make_eval_step(model, criterion)

    rng = np.random.default_rng(3)
    batches = []
    for _ in range(2):
        b = synthetic_batch(rng, 8, 64, 64, max_gt=5, num_classes=7)
        b["image_valid"] = np.ones(8, bool)
        b["pad_count"] = np.int32(0)
        batches.append(b)
    names = [f"c{i}" for i in range(7)]

    plain = run_validation((eval_step, state), batches, names)
    mesh = make_mesh(8)
    state_m = shard_state(state, mesh)
    meshed = run_validation((eval_step, state_m), batches, names, mesh=mesh)
    for k in plain:
        assert meshed[k] == pytest.approx(plain[k], rel=1e-4, abs=1e-6), k


def test_validation_beats_watchdog_per_batch():
    """run_validation must emit one watchdog heartbeat per eval batch and
    pause the dog before the host-only mAP compute at the end — a wedged
    dispatch mid-eval has to fail fast (exit 42 to the retry wrapper)
    instead of hanging behind a blanket pause, while the long host-side
    COCOeval must not be mistaken for a wedge (utils/watchdog.py)."""
    from detr_tpu.train.train_step import make_eval_step
    from detr_tpu.train.trainer import run_validation

    class RecordingDog:
        def __init__(self):
            self.events = []

        def beat(self):
            self.events.append("beat")

        def pause(self):
            self.events.append("pause")

    state, _, _ = make_setup(batch_size=4)
    model = DETR(TINY)
    tc = TrainingConfig(cumulative_train_batch_size=4, train_batch_size=4)
    criterion = build_criterion(tc, TINY)
    eval_step = make_eval_step(model, criterion)

    rng = np.random.default_rng(4)
    batches = []
    for _ in range(3):
        b = synthetic_batch(rng, 4, 64, 64, max_gt=5, num_classes=7)
        b["image_valid"] = np.ones(4, bool)
        b["pad_count"] = np.int32(0)
        batches.append(b)
    names = [f"c{i}" for i in range(7)]

    dog = RecordingDog()
    run_validation((eval_step, state), batches, names, watchdog=dog)
    assert dog.events == ["beat"] * len(batches) + ["pause"]


def test_multi_device_data_parallel():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    state, step, _ = make_setup(batch_size=8)
    rng = np.random.default_rng(1)
    batch = synthetic_batch(rng, 8, 64, 64, max_gt=5, num_classes=7)

    sharded = shard_batch(batch, mesh)
    state = shard_state(state, mesh)
    new_state, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["loss"]))

    # parity: same batch on a single-device mesh gives the same loss
    mesh1 = make_mesh(1)
    state1, step1, _ = make_setup(batch_size=8)
    b1 = shard_batch(batch, mesh1)
    state1 = shard_state(state1, mesh1)
    _, m1 = step1(state1, b1)
    assert float(m1["loss"]) == pytest.approx(float(metrics["loss"]), rel=2e-4)
