"""Multi-host (multi-process) bootstrap: jax.distributed over ICI + DCN.

The reference's distributed story is single-host NCCL TP inside nano-vllm
(model_runner.py:66-71 init_process_group + SHM mailbox).  The TPU-native
design (SURVEY.md §5.8) instead forms ONE global (dp, tp) mesh across all
hosts: tp stays inside a slice (ICI), dp spans hosts (DCN), and XLA routes
collectives accordingly — no hand-written rank mailboxes.

Usage on each host of a pod slice (or via TPU metadata auto-detection, where
coordinator/process counts come from the environment):

    from acestep_tpu.parallel import distributed
    distributed.initialize()                  # env/metadata-driven
    mesh = distributed.global_mesh()          # (dp, tp) over ALL devices

Single-process (or CI) calls are no-ops that fall back to the local mesh, so
the same entry points work from one chip to a pod.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from acestep_tpu.parallel.mesh import make_mesh, tier_for

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed; returns True if a multi-process runtime was
    set up, False for the single-process fallback.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) and then to TPU-metadata
    auto-detection (jax.distributed.initialize with no args inside a pod).
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None)
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None)

    try:
        if coordinator_address:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif os.environ.get("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize()       # TPU metadata auto-detect
        else:
            return False                       # single process
        _initialized = True
        return jax.process_count() > 1
    except (RuntimeError, ValueError):
        return False
    finally:
        _initialized = True


def topology() -> Tuple[int, int, int]:
    """(n_processes, local_devices, global_devices)."""
    return jax.process_count(), jax.local_device_count(), jax.device_count()


def global_mesh(dp: Optional[int] = None, tp: Optional[int] = None):
    """Build the global (dp, tp) mesh over every device in the job.

    tp must divide the per-host (per-slice) device count so the tp axis rides
    ICI; dp spans the host dimension (DCN).  Defaults come from the tier table
    for the GLOBAL device count, clamped so tp never crosses hosts.
    """
    n = jax.device_count()
    local = jax.local_device_count()
    if tp is None:
        tier = tier_for(n)
        tp = tier.tp
    tp = min(tp, local)
    while local % tp != 0 and tp > 1:
        tp -= 1
    if dp is None:
        dp = n // tp
    # devices ordered host-major by default: reshaping (dp, tp) keeps each tp
    # group within one host's local devices when tp divides local
    return make_mesh(n_devices=n, dp=dp, tp=tp)


def is_primary() -> bool:
    """True on the process that should own logging / checkpoint writes."""
    return jax.process_index() == 0
