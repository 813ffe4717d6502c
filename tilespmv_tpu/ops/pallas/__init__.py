from .kernels import spmv_pallas
from .lane_plan import LanePlan, build_lane_plan

__all__ = ["spmv_pallas", "LanePlan", "build_lane_plan"]
