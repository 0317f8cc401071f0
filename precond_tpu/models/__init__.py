from . import cloth, collision, simulator, tetmesh  # noqa: F401
from .simulator import ClothSim, SimState, SoftBodySim  # noqa: F401
