from .solvers import cg, richardson_refine, power_method

__all__ = ["cg", "richardson_refine", "power_method"]
