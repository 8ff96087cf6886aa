"""Device mesh + sharding rules.

TPU-native replacement for the reference's process-per-GPU DDP runtime
(reference ``slowfast/utils/{multiprocessing,distributed}.py``): one process
per host, a ``(data, model)`` mesh over all chips, batch sharded on ``data``,
gradients reduced by XLA collectives over ICI (no explicit NCCL calls).

The ``model`` axis is an optional tensor-parallel dimension sharding the MLP
hidden dimension only (``fc1`` column-wise, ``fc2`` row-wise — see
``_param_spec``); the QKV projections stay replicated by design, because the
low head counts of the early blocks make head/channel sharding unprofitable
(the trade-off is documented in docs/PARITY.md).  Default ``model=1``
reproduces pure data parallelism, matching the reference's capability (DP was
its only gradient parallelism).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(cfg=None, devices=None, data: int = -1, model: int = 1) -> Mesh:
    if cfg is not None:
        data = cfg.TPU.MESH_DATA
        model = cfg.TPU.MESH_MODEL
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data <= 0:
        data = n // model
    assert data * model <= n, (
        f"mesh {data}x{model} > {n} devices; set TPU.MESH_DATA/TPU.MESH_MODEL"
    )
    devices = list(devices)[: data * model]
    dev_array = mesh_utils.create_device_mesh((data, model), devices=np.asarray(devices))
    return Mesh(dev_array, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs/labels."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path_keys, leaf) -> P:
    """Tensor-parallel partition spec for one parameter.

    Shards: mlp fc1 kernel on its output (hidden) dim, fc2 on its input dim,
    qkv kernel on its output dim, attention out-proj on its input dim.  All
    biases of sharded outputs shard on the same axis.  Everything else is
    replicated (data-parallel).
    """
    keys = [str(k) for k in path_keys]
    name = keys[-1]
    parent = keys[-2] if len(keys) >= 2 else ""
    # TP shards only the MLP (Megatron-style column->row) — a deliberate
    # scope, see docs/PARITY.md "Scope of the model axis": the fused qkv
    # param's q|k|v boundaries don't align with a uniform dim split, the
    # per-head pool+LN between qkv and attention forces GSPMD reshards
    # under head sharding, and stem blocks have num_heads=1.
    if parent == "fc1":
        return P(None, "model") if name == "kernel" else P("model")
    if parent == "fc2":
        return P("model", None) if name == "kernel" else P()
    return P()


def param_sharding(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """NamedSharding tree for a param pytree under the TP rules above."""

    def to_sharding(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", p)) for p in path]
        spec = _param_spec(keys, leaf)
        # Guard: dims must divide; fall back to replication otherwise.
        axis_size = mesh.shape["model"]
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % axis_size != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)
