from . import halo, hosts, pcg, sharded  # noqa: F401
