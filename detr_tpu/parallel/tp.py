"""Tensor (model) parallelism for the DETR transformer — GSPMD style.

TPU-native scale-out beyond data parallelism (SURVEY §2.3; the reference
has no analog — Accelerate shards only the batch): a 2-D
``Mesh(("data", "model"))`` where attention/FFN weight matrices are
sharded Megatron-style over the ``model`` axis and XLA's sharding
propagation inserts the all-reduces — the model code is untouched.

Column/row split per transformer block:

  * q/k/v projections: kernel (D, D) sharded on the OUTPUT dim
    ``P(None, "model")`` (bias ``P("model")``) — head-major layout means
    this shards whole heads, so per-head attention math stays local;
  * output projection: kernel sharded on the INPUT dim
    ``P("model", None)`` (bias replicated) — XLA inserts the block's one
    all-reduce here;
  * FFN: fc1 column-split, fc2 row-split — same pattern, one all-reduce;
  * everything else (backbone convs, norms, embeddings, heads) replicated.

``num_attention_heads`` must divide by the model-axis size; asserted in
``validate_tp``.

Optimizer state is placed by PATH SUFFIX: mirrored trees inside the
optimizer (mu/nu, MultiSteps acc_grads) end their tree paths with the
param's own path, so those leaves inherit the param's spec even where
``optax.multi_transform`` masking changes the treedef (scalars and
schedule counters replicate).

Used by ``__graft_entry__.dryrun_multichip`` (DP x TP on the virtual mesh)
and tested for loss/grad parity vs single-device in
``tests/test_tensor_parallel.py``.

Multi-host: the supported layout is DP across hosts x TP within a host —
``make_mesh_2d`` over the global (process-major) device list produces
exactly that whenever the TP degree divides the per-host chip count, and
``validate_tp`` rejects any mesh whose model-axis groups cross a process
boundary (a per-layer all-reduce over DCN would dominate the step).
State placement goes through ``jax.make_array_from_callback`` when the
runtime is multi-process, so each process contributes only its
addressable shards; the input pipeline is unchanged (batches shard over
the data axis only — ``mesh.shard_batch`` already assembles them from
process-local rows).  Exercised by a real 2-process x 4-device runtime in
``tests/test_distributed.py::test_two_process_tensor_parallel``.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import keystr, tree_flatten_with_path

from detr_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"

# (path-substring, kernel spec, bias spec); first match wins.
_RULES = (
    # attention input projections: column split (shards whole heads)
    ("query_proj", P(None, MODEL_AXIS), P(MODEL_AXIS)),
    ("key_proj", P(None, MODEL_AXIS), P(MODEL_AXIS)),
    ("value_proj", P(None, MODEL_AXIS), P(MODEL_AXIS)),
    # attention output projection: row split
    ("output_proj", P(MODEL_AXIS, None), P()),
    # FFN: column then row split
    ("ffn']['fc1", P(None, MODEL_AXIS), P(MODEL_AXIS)),
    ("ffn']['fc2", P(MODEL_AXIS, None), P()),
)


def make_mesh_2d(
    num_devices: int = 0, model_parallel: int = 1, devices=None
) -> Mesh:
    """(data, model) mesh: the trailing ``model_parallel`` devices of each
    row are the tensor-parallel group (adjacent devices -> ICI-neighbor
    collectives on real slices)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def validate_tp(detr_config, mesh: Mesh) -> None:
    tp = mesh.shape.get(MODEL_AXIS, 1)
    if tp > 1:
        heads = detr_config.num_attention_heads
        if heads % tp:
            raise ValueError(
                f"num_attention_heads={heads} must divide by the model-axis "
                f"size {tp} (whole heads are sharded)"
            )
        if jax.process_count() > 1:
            # Each model-axis group (one mesh row) must live on ONE host:
            # the per-layer output-proj/fc2 all-reduce then rides ICI.
            rows = np.asarray(mesh.devices).reshape(-1, tp)
            for row in rows:
                procs = {d.process_index for d in row}
                if len(procs) > 1:
                    raise ValueError(
                        f"model-axis group {[d.id for d in row]} spans "
                        f"processes {sorted(procs)} — tensor-parallel groups "
                        "must stay within one host (DP across hosts x TP "
                        "within a host); pick a model_parallel degree that "
                        "divides the per-host chip count"
                    )


def param_specs(params) -> Any:
    """PartitionSpec tree matching ``params`` (replicated where no rule)."""
    flat, treedef = tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        s = keystr(path)
        spec = P()
        for needle, kspec, bspec in _RULES:
            if needle in s:
                if s.endswith("['kernel']"):
                    spec = kspec
                elif s.endswith("['bias']"):
                    spec = bspec
                break
        specs.append(spec)
    return jax.tree_util.tree_unflatten(treedef, specs)


def _put(x, sharding: NamedSharding):
    """Place one host-replicated array under ``sharding``.

    Multi-process: ``device_put`` cannot target non-addressable devices, so
    the global array is assembled via ``make_array_from_callback`` — every
    process holds the full host value (same-seed init / shared restore, the
    same contract as mesh.shard_state) and contributes the shards it owns.
    """
    if jax.process_count() > 1:
        host = np.asarray(x)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )
    return jax.device_put(x, sharding)


def _place_tree(tree, specs, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x, s: _put(x, NamedSharding(mesh, s)), tree, specs
    )


def _place_opt_state(opt_state, params, specs, mesh: Mesh):
    """Place an optax state tree: any array leaf whose tree path ENDS with
    a sharded param's path (same shape) gets that param's spec; everything
    else replicates.

    Suffix matching, not structure matching: mirrored trees inside the
    optimizer (mu/nu, acc_grads) carry the param path verbatim at the end
    of their own path, but their treedefs differ from the params' whenever
    ``optax.multi_transform`` masks the other group's leaves out — a
    structure-matched walk silently replicated every mu/nu (measured:
    303/330 leaves replicated)."""
    suffixes = []
    pflat, _ = tree_flatten_with_path(params)
    sflat, _ = tree_flatten_with_path(specs)
    for (pk, pl), (_, spec) in zip(pflat, sflat):
        if spec != P():
            suffixes.append((keystr(pk), pl.shape, spec))
    rep = NamedSharding(mesh, P())

    def place(path, leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        s = keystr(path)
        for suffix, shape, spec in suffixes:
            if s.endswith(suffix) and leaf.shape == shape:
                return _put(leaf, NamedSharding(mesh, spec))
        return _put(leaf, rep)

    return jax.tree_util.tree_map_with_path(place, opt_state)


def shard_state_tp(state, mesh: Mesh):
    """Places a TrainState on a (data, model) mesh: params/opt-state
    sharded per the Megatron rules, frozen stats and RNG replicated."""
    specs = param_specs(state.params)
    rep = NamedSharding(mesh, P())
    return state.replace(
        params=_place_tree(state.params, specs, mesh),
        frozen=jax.tree_util.tree_map(lambda x: _put(x, rep), state.frozen),
        opt_state=_place_opt_state(state.opt_state, state.params, specs, mesh),
        step=_put(state.step, rep),
        rng=_put(state.rng, rep),
    )
