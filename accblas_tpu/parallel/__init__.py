from .blas import pdot, pgemv, power_step, ptrsm, make_mesh

__all__ = ["pdot", "pgemv", "power_step", "ptrsm", "make_mesh"]
