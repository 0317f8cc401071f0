from . import apply, assembly, batched_inverse, blockcsr, hierarchy, stencils  # noqa: F401
