from .distributed import DistributedSpMV
from .distributed2d import DistributedSpMV2D
from .mesh import (COL_AXIS, ROW_AXIS, initialize_multihost, make_mesh,
                   make_mesh2d)

__all__ = ["DistributedSpMV", "DistributedSpMV2D", "make_mesh",
           "make_mesh2d", "initialize_multihost", "ROW_AXIS", "COL_AXIS"]
