"""Device-mesh sharding layer.

Replaces the reference's entire distribution stack — ``grid/mpiGrid2D.hpp``
(2D MPI Cartesian grids + NCCL comms + BLACS contexts),
``linalg/distMatrix`` (BlockBlock/BlockCyclic matrices, DistMultiVector1D
row↔column redistribution rings) and the mpi/nccl/cuda_aware_mpi kernel
namespaces — with a single ``jax.sharding.Mesh`` carrying axes ('r', 'c')
and GSPMD sharding annotations (SURVEY §2.10 P1–P9).
"""

from .mesh import (  # noqa: F401
    make_grid, matrix_sharding, colvec_sharding, rowvec_sharding,
    replicated_sharding, Grid2D,
)
from .operator import DenseOperator  # noqa: F401
