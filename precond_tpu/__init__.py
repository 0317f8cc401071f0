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

__version__ = "0.1.0"
