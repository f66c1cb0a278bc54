"""Device mesh construction over ICI/DCN.

This module + sharding.py REPLACE the reference's entire distributed stack
(NCCL process groups, DeepSpeed engine/ZeRO, accelerate launcher, the MoE
``_AllToAll`` pair — SURVEY.md §2.6): axes are declared once, parameters and
activations carry PartitionSpecs, and XLA emits/schedules the collectives.

Axes: (data, expert, sequence, model)
  data     — batch + ZeRO-style param/optimizer sharding (outermost; DCN-safe)
  expert   — MoE expert parallelism (all_to_all rides ICI)
  sequence — Ulysses-style sequence sharding of joint attention
  model    — tensor parallelism (heads / MLP hidden)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from unigen_tpu.config import MeshConfig

AXES = ("data", "expert", "sequence", "model")


def _slice_count(devices) -> int:
    """Number of distinct TPU slices in ``devices`` (1 when the runtime
    exposes no ``slice_index`` — CPU host-sim, single slice)."""
    return len({getattr(d, "slice_index", 0) or 0 for d in devices})


def _hybrid_device_array(shape, devices, num_slices: int) -> np.ndarray:
    """Device array for a multi-slice (DCN-connected) job: the data axis is
    factored as (num_slices x per-slice data) with slices stacked OUTERMOST,
    so every collective on expert/sequence/model — and the intra-slice part
    of data — rides ICI; only data-parallel gradient reduction crosses DCN.

    This is the TPU equivalent of the reference's multi-node story (NCCL
    rendezvous over nodes, /root/reference/script/train.sh:25-32): there the
    topology split is implicit in the process launch; here it must be baked
    into the mesh's device layout or XLA will happily route a tensor-
    parallel all-reduce over the slow inter-slice network.
    """
    data, rest = shape[0], tuple(shape[1:])
    if data % num_slices != 0:
        raise ValueError(
            f"mesh data axis ({data}) must be divisible by the number of "
            f"DCN-connected slices ({num_slices}); expert/sequence/model "
            "axes cannot span slices")
    try:
        # preferred: jax's own hybrid construction (optimises the ICI
        # layout within each slice AND keeps DCN on the leading axes)
        return mesh_utils.create_hybrid_device_mesh(
            (data // num_slices,) + rest,
            (num_slices,) + (1,) * len(rest), devices=devices)
    except Exception:
        # manual fallback (mocked devices in tests / odd topologies):
        # group by slice_index, lay each slice out as a sub-mesh, and
        # stack the slices along the data axis
        groups: dict = {}
        for d in devices:
            groups.setdefault(getattr(d, "slice_index", 0) or 0, []).append(d)
        per = (data // num_slices,) + rest
        subs = []
        for sidx in sorted(groups):
            devs = sorted(groups[sidx], key=lambda d: getattr(d, "id", 0))
            assert len(devs) == int(np.prod(per)), (
                f"slice {sidx} has {len(devs)} devices; mesh needs "
                f"{int(np.prod(per))} per slice")
            try:
                subs.append(mesh_utils.create_device_mesh(per, devices=devs))
            except Exception:
                subs.append(np.asarray(devs, dtype=object).reshape(per))
        return np.concatenate(subs, axis=0)


def build_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build a Mesh. With no config, all devices go to the data axis.

    On a single slice, create_device_mesh maps expert/sequence/model axes to
    ICI neighbours. When ``devices`` spans multiple slices (multi-slice TPU
    pod connected over DCN, detected via ``device.slice_index``), the mesh
    is built hybrid: the data axis factors as slices-outermost so DCN
    traffic is data-parallel gradient reduction ONLY — expert all_to_all,
    sequence all_gather and model-parallel reductions stay on ICI.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if cfg is None:
        cfg = MeshConfig(data=n)
    shape = cfg.shape
    used = int(np.prod(shape))
    assert used == n, f"mesh shape {shape} needs {used} devices, have {n}"
    num_slices = _slice_count(devices)
    if num_slices > 1:
        dev_array = _hybrid_device_array(shape, devices, num_slices)
    else:
        try:
            dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
        except Exception:  # fallback for host-sim / odd topologies
            dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXES)


def multihost_init(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap (replaces MASTER_ADDR/PORT plumbing in
    reference script/train.sh:25-26). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
