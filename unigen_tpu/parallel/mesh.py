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


def build_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build a Mesh. With no config, all devices go to the data axis.

    On multi-host TPU slices the data axis is placed outermost so inter-host
    (DCN) traffic is data-parallel gradient reduction only; expert/sequence/
    model axes map to ICI neighbours via create_device_mesh.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if cfg is None:
        cfg = MeshConfig(data=n)
    shape = cfg.shape
    used = int(np.prod(shape))
    assert used == n, f"mesh shape {shape} needs {used} devices, have {n}"
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
