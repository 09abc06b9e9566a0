from .blas import pcg, pdot, pgemv, power_step, ptrsm, ptrsv, make_mesh

__all__ = ["pcg", "pdot", "pgemv", "power_step", "ptrsm", "ptrsv", "make_mesh"]
