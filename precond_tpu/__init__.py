"""precond_tpu — TPU-native multilevel additive Schwarz preconditioning.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference GPU multilevel additive Schwarz preconditioner for cloth and
deformable-body simulation (Wu, Wang & Wang, SIGGRAPH/TOG 2022;
/root/reference). Not a port: the warp/ballot/atomic CUDA-shaped kernels of
the reference are re-expressed as batched dense linear algebra (MXU),
vectorized mask fixpoints, deterministic segment reductions, and
shard_map-sharded SpMV for multi-chip scaling.
"""

from .config import SchwarzConfig  # noqa: F401
from .solver import (  # noqa: F401
    SchwarzPreconditioner,
    SortMaps,
    compute_sort_maps,
    prepare_preconditioner,
)
from .ops.apply import ApplyState, precondition  # noqa: F401
from .ops.blockcsr import BlockEll, from_coo, spmv  # noqa: F401
from .ops.stencils import EeSets, EfSets, Stencils, VfSets, build_stencils  # noqa: F401
from .parallel.pcg import PcgResult, jacobi_preconditioner, pcg, pcg_with_history  # noqa: F401

__version__ = "0.1.0"
