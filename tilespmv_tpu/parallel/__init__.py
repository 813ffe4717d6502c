from .distributed import DistributedSpMV
from .mesh import ROW_AXIS, make_mesh

__all__ = ["DistributedSpMV", "make_mesh", "ROW_AXIS"]
