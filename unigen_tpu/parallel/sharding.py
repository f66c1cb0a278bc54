"""Sharding rules: param-path -> PartitionSpec, plus activation constraints.

ZeRO-equivalent fully-sharded state = NamedSharding over the 'data' axis on
each stacked-block leading dimension (XLA all-gathers block params on use,
exactly the reference's ZeRO-3 gather-on-use but compiler-scheduled;
reference config/ds_zero3.json). TP shards attention/MLP hidden dims over
'model'; MoE expert stacks shard over 'expert'.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-tree key names whose FIRST axis is a stacked-block axis
_STACKED_KEYS = ("double_blocks", "single_blocks", "add_double", "add_single",
                 "joint_blocks", "blocks")
_EXPERT_KEYS = ("experts",)
# linear names whose OUTPUT dim is TP-sharded (column parallel)
_COL_PARALLEL = ("to_q", "to_k", "to_v", "add_q", "add_k", "add_v",
                 "condition_k", "condition_v", "fc1", "proj_mlp")
# linear names whose INPUT dim is TP-sharded (row parallel)
_ROW_PARALLEL = ("to_out", "to_add_out", "fc2", "proj_out")


def _axis_size(mesh: Mesh, name: str) -> int:
    return mesh.shape.get(name, 1)


def param_spec(path, leaf, mesh: Mesh, *, zero_sharding: bool = True,
               tp: bool = True) -> P:
    """Derive a PartitionSpec from a tree path (tuple of DictKey/ints)."""
    keys = [getattr(k, "key", None) for k in path]
    names = [k for k in keys if isinstance(k, str)]
    ndim = leaf.ndim

    spec = [None] * ndim
    stacked = any(k in _STACKED_KEYS for k in names)
    expert = any(k in _EXPERT_KEYS for k in names)
    offset = 1 if (stacked or expert) else 0

    if expert and ndim >= 1 and _axis_size(mesh, "expert") > 1 \
            and leaf.shape[0] % _axis_size(mesh, "expert") == 0:
        spec[0] = "expert"
    elif stacked and zero_sharding and ndim >= 1 \
            and _axis_size(mesh, "data") > 1 \
            and leaf.shape[0] % _axis_size(mesh, "data") == 0:
        spec[0] = "data"

    if tp and _axis_size(mesh, "model") > 1 and ndim - offset >= 1:
        # find which linear this leaf belongs to; shard w only (bias for
        # column-parallel shards its single dim)
        owner = None
        for k in reversed(names):
            if k in _COL_PARALLEL:
                owner = "col"
                break
            if k in _ROW_PARALLEL:
                owner = "row"
                break
        # quantized serving leaves shard like their fp counterparts:
        # w_q [in,out] / w_q4 [in/2,out] like w; w_scale (per-out-channel)
        # like the bias for column-parallel, replicated for row-parallel
        is_w = names and names[-1] in ("w", "w_q", "w_q4")
        is_b = names and names[-1] in ("b", "w_scale")
        m = _axis_size(mesh, "model")
        if owner == "col":
            if is_w and leaf.shape[-1] % m == 0:
                spec[-1] = "model"
            elif is_b and leaf.shape[-1] % m == 0:
                spec[-1] = "model"
        elif owner == "row" and is_w and leaf.shape[-2] % m == 0 \
                and spec[-2] is None:
            spec[-2] = "model"
    return P(*spec)


def place_global(x, sharding):
    """``device_put`` that also works when ``sharding`` spans PROCESSES.

    In a multi-process job a committed single-device array cannot be
    ``device_put`` onto a cross-process sharding (the backend refuses the
    cross-host transfer — caught by tests/test_multiprocess.py on the
    Trainer resume path, and the serving ``_place_inputs`` has the same
    shape: encoder outputs are committed device arrays). Every process
    holds the full host value in the single-controller pattern, so the
    global array is assembled from local lookups instead. Already-global
    arrays pass through (the jit program reshards by spec)."""
    import numpy as np
    if not hasattr(x, "ndim"):
        return x
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return x
    if jax.process_count() > 1:
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])
    return jax.device_put(x, sharding)


def fetch_global(x):
    """Device->host for a possibly multi-process-sharded array: allgathers
    across processes when the value is not fully addressable locally (the
    serving pipelines' image conversion), plain np.asarray otherwise."""
    import numpy as np
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def shard_params(params, mesh: Mesh, **kw):
    """Place a param tree onto the mesh according to the rules."""
    def _place(path, leaf):
        s = NamedSharding(mesh, param_spec(path, leaf, mesh, **kw))
        return place_global(leaf, s)
    return jax.tree_util.tree_map_with_path(_place, params)


def param_shardings(params, mesh: Mesh, **kw):
    """The matching tree of NamedShardings (for jit in_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, mesh, **kw)),
        params)


def batch_sharding(mesh: Mesh, ndim: int, *, seq_axis: Optional[int] = None
                   ) -> NamedSharding:
    """Activations: batch over 'data' (optionally sequence over 'sequence')."""
    spec = [None] * ndim
    spec[0] = "data"
    if seq_axis is not None and _axis_size(mesh, "sequence") > 1:
        spec[seq_axis] = "sequence"
    return NamedSharding(mesh, P(*spec))


def constrain(x: jnp.ndarray, mesh: Optional[Mesh], *spec) -> jnp.ndarray:
    """with_sharding_constraint that degrades to a no-op without a mesh."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
