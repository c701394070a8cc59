"""Multi-host runtime: jax.distributed init + the 2-axis production mesh.

SURVEY §2c/§5: the reference's only scale-out is the external Aligned
operator fleet (one proof per operator); here the two parallel axes of
the workload map onto one device mesh:

  * `dp` (proof batch)  — sharded ACROSS HOSTS: batches are independent,
    so the only dp-axis traffic is the final all-reduce of per-proof
    verdicts; it rides DCN fine.
  * `pt` (MSM points / windows) — sharded WITHIN a host: the bucket
    phase's partial-result gather (ops/msm.py::msm_sharded moves D
    points per MSM) stays on ICI.

jax.distributed is the one communication layer (no NCCL/MPI to port —
the reference has none, SURVEY §2c); XLA inserts all collectives from
the sharding annotations.

Single-process use (tests, the single-chip driver box) needs no init:
`production_mesh` builds from whatever `jax.devices()` shows, including
the virtual 8-CPU-device test mesh.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger("mina_bridge_tpu.distributed")


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-host cluster (idempotent; no-op single-process).

    Arguments default from the standard env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID — also auto-populated on Cloud TPU
    pods), mirroring the reference's env-driven config layer (SURVEY §5).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0") or 0)
    if not coordinator_address or num_processes <= 1:
        log.debug("single-process run: jax.distributed not initialized")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "joined cluster: process %d/%d via %s",
        process_id,
        num_processes,
        coordinator_address,
    )


def production_mesh(dp: int | None = None) -> Mesh:
    """The (dp, pt) mesh: dp spans hosts (process granularity) and pt
    spans each host's local chips, so dp-axis collectives ride DCN and
    pt-axis collectives ride ICI.

    dp defaults to the process count (1 per host); pass an explicit dp
    to oversubscribe the batch axis onto local chips too (useful on the
    virtual CPU test mesh, where all "hosts" are one process).
    """
    devs = np.array(jax.devices())
    if dp is None:
        dp = max(jax.process_count(), 1)
    assert devs.size % dp == 0, (devs.size, dp)
    return Mesh(devs.reshape(dp, devs.size // dp), ("dp", "pt"))
