from .cpu_reference import plan_chunks, spmv_cpu

__all__ = ["spmv_cpu", "plan_chunks"]
