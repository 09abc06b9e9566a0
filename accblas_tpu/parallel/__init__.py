from .blas import pdot, pgemv, power_step, make_mesh

__all__ = ["pdot", "pgemv", "power_step", "make_mesh"]
