"""Device mesh + sharding layout.

The reference is single-device (SURVEY.md §2.4: no DDP/NCCL anywhere; one GPU
selected by --gpu_id). Here distribution is first-class and TPU-native: a 2-D
(data, model) `jax.sharding.Mesh`; the global batch is sharded over `data`,
large parameter matrices over `model`, and XLA GSPMD inserts the ICI
collectives (grad psum, activation all-gathers) under jit.

The model axis defaults to 1 (the VAE is tens of MB — data parallel is the
right default); it is fully plumbed so `model_axis>1` shards the widest
matmuls (chord encoder/decoder, per-relation GNN weights, CNN dense layers).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed() -> None:
    """Multi-host setup: call once per process before device queries when
    running on a multi-host TPU slice. No-op unless the standard cluster
    env (JAX coordinator variables) is present."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(model_axis: int = 1, devices=None,
              batch_size: int | None = None) -> Mesh:
    """(data, model) mesh over the available devices.

    When batch_size is given, the data axis shrinks to the largest device
    count that divides it (a global batch must shard evenly over `data`).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    data_axis = n // model_axis
    if batch_size is not None:
        while data_axis > 1 and batch_size % data_axis != 0:
            data_axis -= 1
    arr = np.asarray(devices[: data_axis * model_axis]).reshape(
        data_axis, model_axis)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def global_batch_put(tokens, mask, mesh: Mesh):
    """Assemble a data-sharded global batch from this process's local shard.

    Single-host: a plain sharded device_put. Multi-host (after
    jax.distributed.initialize): each process passes ONLY its
    (global_batch / process_count) rows — loaded by BatchLoader(shard=...) —
    and the returned jax.Arrays are global, laid out so every process holds
    exactly its addressable shards. The train step then runs SPMD over the
    full mesh and GSPMD's grad psum rides ICI/DCN (SURVEY.md §2.4
    comm-backend row; the reference has no multi-device story at all,
    /root/reference/train.py:120-122)."""
    bsh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tokens, bsh), jax.device_put(mask, bsh)
    nproc = jax.process_count()
    gt = (tokens.shape[0] * nproc,) + tuple(tokens.shape[1:])
    gm = (mask.shape[0] * nproc,) + tuple(mask.shape[1:])
    return (jax.make_array_from_process_local_data(bsh, tokens, gt),
            jax.make_array_from_process_local_data(bsh, mask, gm))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter partitioning rules: path-substring -> PartitionSpec.
# The GNN relation weights shard their output dim; the chord bottleneck
# Linears shard their wide (15*d) dim; other params replicate.
_RULES = (
    ("chord_encoder/kernel", P(MODEL_AXIS, None)),
    ("chord_decoder/kernel", P(None, MODEL_AXIS)),
    ("chord_decoder/bias", P(MODEL_AXIS)),
    ("rel_weight", P(None, None, MODEL_AXIS)),
    ("root", P(None, MODEL_AXIS)),
    ("bars_encoder/kernel", P(MODEL_AXIS, None)),
    ("bars_decoder/kernel", P(None, MODEL_AXIS)),
    ("bars_decoder/bias", P(MODEL_AXIS)),
)


def _spec_for_path(path: str, shape) -> P:
    for frag, spec in _RULES:
        if frag in path and len(spec) <= len(shape):
            return spec
    return P()


def param_sharding(mesh: Mesh, tree):
    """NamedSharding tree for a variable tree, applying tensor-parallel rules
    on the model axis (no-ops when model_axis size is 1)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    shardings = []
    for path, leaf in flat:
        p = jax.tree_util.keystr(path, simple=True, separator="/")
        spec = _spec_for_path(p, getattr(leaf, "shape", ()))
        if mesh.shape[MODEL_AXIS] == 1:
            spec = P()
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)
