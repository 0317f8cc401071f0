from . import symv  # noqa: F401
