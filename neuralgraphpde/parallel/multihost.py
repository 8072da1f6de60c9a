"""Multi-host bootstrap (SURVEY §5.3/§5.8): jax.distributed lifecycle and
mesh construction across hosts.

The reference is single-process; this is the standard JAX multi-host recipe:
one process per host, ``initialize()`` before any jax call, a global mesh
whose leading axis spans all devices, coordinator-based failure detection
(a crashed process takes down the coordinated job; recovery = restart from
the latest checkpoint via ``train.fit(resume=True)``). Elasticity is out of
scope (fixed mesh), as documented in SURVEY §5.3.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    heartbeat_timeout_s: int = 100,
) -> None:
    """Wrapper over ``jax.distributed.initialize``; no-op when single-process
    (all args None and no cluster env detected)."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return  # single-process / no cluster environment: fine
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=heartbeat_timeout_s,
    )


def global_mesh(axis_name: str = "graph") -> Mesh:
    """One-axis mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def is_coordinator() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "ngpde_barrier") -> None:
    """Cross-host sync point — ``multihost_utils.sync_global_devices`` (the
    canonical JAX barrier; a named all-reduce over every device in the
    job). No-op single-process. Exercised for real by the two-process CPU
    test in tests/test_multihost.py."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
