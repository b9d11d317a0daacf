"""Multi-host initialization (DCN) — the scale-out path.

Single-host meshes (this container: 1 chip; tests: 8 virtual CPU devices)
need none of this. On a multi-host pod slice, call ``initialize()`` once
per process before any jax op; ``make_global_mesh`` then builds the same
1-D data mesh over ALL hosts' devices, and the existing shard_map train
steps run unchanged — they are mesh-size-agnostic by construction
(SURVEY.md §5 distributed-backend row).

Untestable in this container (one host); kept minimal and defensive.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU auto-detection when args are None.

    The already-initialized guard must NOT touch the backend —
    ``jax.process_count()`` would initialize XLA and make the subsequent
    ``jax.distributed.initialize`` an error — so it inspects the
    distributed client state directly."""
    try:
        from jax._src.distributed import global_state

        if global_state.client is not None:
            return  # already initialized
    except (ImportError, AttributeError):
        pass  # jax internals moved: fall through, initialize() will raise
              # its own clear error if called twice
    kwargs = {}
    if coordinator_address is not None:
        kwargs = {
            "coordinator_address": coordinator_address,
            "num_processes": num_processes,
            "process_id": process_id,
        }
    jax.distributed.initialize(**kwargs)


def make_global_mesh(axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over every device of every participating host."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def per_host_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n
