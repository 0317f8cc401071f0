from . import pcg  # noqa: F401
