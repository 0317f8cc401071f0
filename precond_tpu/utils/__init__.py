from . import aabb, morton  # noqa: F401
