from .matrix import MatrixInfo, gen_mtx, write_random, convert_mtx, format_mtx
from .bench import benchmark_function, synchronize, Timer, BENCH_ITERS
from .compare import tree_reduce, compare, norm1, relative_error
from . import devgen, prng, sr

__all__ = [
    "devgen",
    "sr",
    "MatrixInfo",
    "gen_mtx",
    "write_random",
    "convert_mtx",
    "format_mtx",
    "benchmark_function",
    "synchronize",
    "Timer",
    "BENCH_ITERS",
    "tree_reduce",
    "compare",
    "norm1",
    "relative_error",
    "prng",
]
