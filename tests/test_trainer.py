"""End-to-end trainer smoke tests (reference debug-knob style: limit-iters

tiny runs, checkpoint save/restore, weights-only resume — SURVEY §4
implication (e))."""

import os

import jax
import numpy as np
import pytest

from detr_tpu.config import DETRConfig, TrainingConfig
from detr_tpu.train.checkpoint import CheckpointManager
from detr_tpu.train.trainer import train_DETR

TINY = DETRConfig(
    num_object_queries=8,
    num_encoder_layers=1,
    num_decoder_layers=2,
    num_attention_heads=2,
    hidden_size=16,
    ffn_scale_factor=2,
    dtype="float32",
)


def tiny_config(tmp_path, **kw):
    defaults = dict(
        output_dir=str(tmp_path / "run"),
        cumulative_train_batch_size=2,
        train_batch_size=2,
        val_batch_size=2,
        epochs=2,
        lr_warmup_epochs=1,
        lr_hold_max_epochs=1,
        limit_train_iters=2,
        limit_val_iters=1,
        eval_epochs=1,
        checkpoint_epochs=1,
        log_frequency=1,
        shape_buckets=((64, 64),),
        max_gt_boxes=8,
        num_devices=1,
        donate_state=False,
    )
    defaults.update(kw)
    return TrainingConfig(**defaults)


def test_synthetic_smoke_train(tmp_path):
    config = tiny_config(tmp_path)
    metrics = train_DETR(config, TINY, synthetic=True)
    # ran validation and produced the COCO AP family
    for key in ("AP", "AP50", "AP75", "AP-small", "AP-medium", "AP-large"):
        assert key in metrics
    # checkpoints written with retention
    ckpt_dir = os.path.join(config.output_dir, "checkpoints")
    assert os.path.isdir(ckpt_dir)
    assert len(os.listdir(ckpt_dir)) >= 1
    # tensorboard event files written
    logs = os.path.join(config.output_dir, "logs")
    assert any(f.startswith("events") for f in os.listdir(logs))


def test_weights_only_resume(tmp_path):
    config = tiny_config(tmp_path)
    train_DETR(config, TINY, synthetic=True)

    # resume into a fresh run: weights load, training continues
    config2 = tiny_config(
        tmp_path,
        output_dir=str(tmp_path / "run2"),
        resume_from_checkpoint=config.output_dir,
        epochs=1,
    )
    metrics = train_DETR(config2, TINY, synthetic=True)
    assert "AP" in metrics


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax

    from detr_tpu.data import synthetic_batch
    from detr_tpu.models import DETR
    from detr_tpu.train import create_train_state

    model = DETR(TINY)
    tx = optax.adam(1e-3)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            np.random.default_rng(0), 2, 64, 64, max_gt=8
        ).items()
    }
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    state = state.replace(step=jnp.int32(7))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(0, jax.device_get(state), extra={"epoch": 0})
    assert mgr.latest_step() == 0

    # full restore into a zeroed template
    zeroed = state.replace(
        params=jax.tree_util.tree_map(lambda x: x * 0, state.params),
        step=jnp.int32(0),
    )
    restored, extra = mgr.restore(zeroed)
    assert int(restored.step) == 7
    assert extra.get("epoch") == 0
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # weights-only restore leaves opt_state/step fresh
    w_only = mgr.restore_params_only(zeroed)
    assert int(w_only.step) == 0
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(w_only.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )

    # Distilled {params, frozen} artifact (scripts/export_weights.py):
    # export from the full checkpoint, then weights-only resume from the
    # artifact — the committed-seed path that survives VM resets.
    payload = mgr.restore_payload(0)
    dst = CheckpointManager(str(tmp_path / "weights"), max_to_keep=1)
    dst.save_params_only(0, payload["params"], payload["frozen"])
    from_artifact = dst.restore_params_only(zeroed)
    assert int(from_artifact.step) == 0  # optimizer/step stay fresh
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(from_artifact.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.frozen),
        jax.tree_util.tree_leaves(from_artifact.frozen),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    dst.close()
    mgr.close()


def test_checkpoint_retention(tmp_path):
    import jax.numpy as jnp
    import optax

    from detr_tpu.data import synthetic_batch
    from detr_tpu.models import DETR
    from detr_tpu.train import create_train_state

    model = DETR(TINY)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            np.random.default_rng(0), 1, 64, 64, max_gt=4
        ).items()
    }
    state = create_train_state(model, optax.sgd(0.1), jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for e in range(4):
        mgr.save(e, jax.device_get(state))
    assert mgr.latest_step() == 3
    steps = sorted(int(d) for d in os.listdir(mgr.directory) if d.isdigit())
    assert len(steps) <= 2  # retention limit (reference total_limit=3 scheme)
    mgr.close()


def test_crash_recovery_auto_restore(tmp_path):
    """Re-running train_DETR on an output dir with checkpoints resumes from

    the last completed epoch with full state (SURVEY §5 elastic recovery)."""
    config = tiny_config(tmp_path, epochs=2)
    train_DETR(config, TINY, synthetic=True)

    # "crash": rerun with more epochs on the same output dir
    config2 = tiny_config(tmp_path, epochs=3)
    metrics = train_DETR(config2, TINY, synthetic=True)
    assert "AP" in metrics
    ckpt_dir = os.path.join(config.output_dir, "checkpoints")
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    assert steps[-1] == 2  # epoch 2 checkpoint written by the resumed run


def test_fast_resume_abstract_template_restore(tmp_path):
    """Fast-resume path (train_step.create_train_state_abstract): restoring
    a full-state checkpoint into a shape-only template must reproduce the
    saved state exactly — no init compile, no calibration, no real arrays
    materialized before the restore."""
    import jax.numpy as jnp
    import optax

    from detr_tpu.data import synthetic_batch
    from detr_tpu.models import DETR
    from detr_tpu.train import create_train_state, create_train_state_abstract

    model = DETR(TINY)
    tx = optax.adam(1e-3)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            np.random.default_rng(0), 2, 64, 64, max_gt=8
        ).items()
    }
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    state = state.replace(step=jnp.int32(11))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(0, jax.device_get(state), extra={"epoch": 4})

    abstract = create_train_state_abstract(
        model, tx, jax.random.PRNGKey(0), batch
    )
    # every leaf really is shape-only (nothing touched the device)
    for leaf in jax.tree_util.tree_leaves(abstract):
        assert isinstance(leaf, jax.ShapeDtypeStruct), type(leaf)

    restored, extra = mgr.restore(abstract)
    assert int(restored.step) == 11
    assert extra.get("epoch") == 4
    ref_leaves = jax.tree_util.tree_leaves(
        {"p": state.params, "f": state.frozen, "o": state.opt_state}
    )
    got_leaves = jax.tree_util.tree_leaves(
        {"p": restored.params, "f": restored.frozen, "o": restored.opt_state}
    )
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state.rng), np.asarray(restored.rng))


def test_derive_val_envelope_reference_and_curriculum():
    """--val-min-size scales the whole reference val envelope.

    Reference detr/data.py:66-83 hardcodes shortest 800 / max 1333 and our
    fixed canvas is 800x1344; a curriculum phase at a smaller shortest side
    must keep the same proportions (max side 1333/800, canvas /32-rounded)
    so resized val images always fit the compiled canvas.
    """
    from detr_tpu.train.trainer import derive_val_envelope

    assert derive_val_envelope(800) == (800, 1333, (800, 1344))
    vms, vmax, canvas = derive_val_envelope(384)
    assert (vms, vmax) == (384, 640)
    assert canvas == (384, 672)
    # fit invariant: any resize with shortest side vms, longest <= vmax
    # fits canvas or its transpose
    assert vms <= canvas[0] and vmax <= canvas[1]


def test_val_transform_min_size_plumbs_through():
    from detr_tpu.data.transforms import get_val_transforms

    t = get_val_transforms(normalize=False, min_size=384)
    img = np.zeros((768, 768, 3), dtype=np.uint8)
    target = {
        "boxes": np.zeros((0, 4), dtype=np.float32),
        "class_idx": np.zeros((0,), dtype=np.int64),
        "class_id": np.zeros((0,), dtype=np.int64),
        "iscrowd": np.zeros((0,), dtype=np.int64),
    }
    out, _ = t(img, target)
    assert out.shape[:2] == (384, 384)
    # source wire: emit_source returns the ORIGINAL pixels + resize_to
    t2 = get_val_transforms(normalize=False, emit_source=True, min_size=384)
    out2, tgt2 = t2(img, dict(target))
    assert out2.shape[:2] == (768, 768)
    assert tgt2["resize_to"] == (384, 384)
