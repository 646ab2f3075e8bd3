"""Multi-host (pod-slice) initialization helpers.

Reference analogue: the user-side MPI_Init + MPI_Dims_create +
MpiGrid2D(comm) boilerplate of the distributed examples
(examples/1_hello_world.cpp:36-60).  On TPU pods the runtime handles
process bootstrapping; these helpers wrap `jax.distributed.initialize` and
build the global ('r','c') grid spanning all hosts so ICI carries the
row/column collectives inside a slice and DCN across slices.

Typical pod usage (same script on every host):

    from chase_tpu.parallel import multihost
    grid = multihost.init_grid()            # all devices, near-square
    H = chase_tpu.io.load_matrix_sharded(path, N, dtype, grid)
    res = chase_tpu.eigsh(chase_tpu.DenseOperator(H, grid=grid), nev, nex)
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .mesh import Grid2D, make_grid

__all__ = ["init_grid", "ensure_initialized", "is_multihost",
           "process_info"]


def ensure_initialized(coordinator: Optional[str] = None) -> None:
    """Initialize the distributed runtime when the environment calls for
    it (idempotent).  Must run before any XLA backend touch."""
    if _needs_distributed() or coordinator:
        # Decide from ENV ONLY: probing jax.process_count() here would
        # initialize the XLA backend and make distributed.initialize
        # impossible (it must run before any backend touch).
        kwargs = {}
        if coordinator:
            kwargs["coordinator_address"] = coordinator
        # explicit size/rank envs for clusters jax cannot auto-detect
        # (SLURM/OMPI are auto-detected; plain ssh launches are not)
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:
            # re-init on an already-running client is a no-op; jax's
            # message is 'distributed.initialize should only be called
            # once.' (jax._src.distributed), older versions say 'already'
            msg = str(e).lower()
            if "already" not in msg and "only be called once" not in msg:
                raise


def init_grid(shape: Optional[tuple[int, int]] = None,
              coordinator: Optional[str] = None) -> Grid2D:
    """Initialize the distributed runtime (if needed) and build the grid.

    On Cloud TPU pods `jax.distributed.initialize()` discovers everything
    from the metadata server; other clusters pass ``coordinator`` plus the
    JAX_NUM_PROCESSES/JAX_PROCESS_ID envs.
    """
    ensure_initialized(coordinator)
    return make_grid(shape=shape)


def _needs_distributed() -> bool:
    return bool(os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
                or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0)


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_info() -> dict:
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": jax.device_count()}
