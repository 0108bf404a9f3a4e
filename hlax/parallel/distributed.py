"""Multi-host initialization for SPMD training.

The reference has no distributed backend at all (SURVEY.md §2); this is the
TPU-native story: call ``initialize()`` once per process before building a
mesh — on a multi-host TPU slice jax.distributed wires the hosts together
and ``jax.devices()`` becomes the global device list, so the same
mesh/sharding code (hlax.parallel.mesh) runs 1-chip, 1-host-N-chip, and
N-host over ICI/DCN without modification.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-process.

    No-op for single-process runs (the common single-host case) and when
    the environment provides no coordinator information.

    The already-initialized probe must NOT touch the XLA backend:
    ``jax.process_count()`` here would bring the backend up and make the
    subsequent ``jax.distributed.initialize()`` raise unconditionally
    ("must be called before any JAX calls") — found by the two-process
    smoke test (tests/test_distributed.py), which is exactly the failure
    mode this module had before it was ever exercised multi-process.
    """
    if jax.distributed.is_initialized():
        return   # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return   # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
