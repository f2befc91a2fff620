"""Multi-host (pod-slice) initialization.

Single-host multi-chip needs nothing beyond ``make_mesh()``.  On a pod slice
each host must join the distributed runtime before any backend use so
``jax.devices()`` spans every chip and collectives ride ICI/DCN
(SURVEY §5.8: multi-host only enters for pod-slice scale-out of the same
data-parallel pattern).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the JAX distributed runtime when running multi-host.

    With no arguments, auto-detects from the environment (TPU pod metadata
    or ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``).
    Returns True if distributed mode was initialized, False for single-host
    runs (not an error).  Call before any other JAX use.
    """
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    # multi-host pod metadata without an explicit coordinator: let JAX
    # auto-detect everything (it reads the TPU metadata itself)
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_host_pod = len([h for h in hostnames.split(",") if h]) > 1

    if coordinator_address is None and not multi_host_pod:
        return False

    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return True
