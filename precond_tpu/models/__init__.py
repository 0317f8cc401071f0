from . import cloth  # noqa: F401
