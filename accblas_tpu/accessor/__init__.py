from .dtypes import canon, promote, jnp_dtype, is_df
from .range import Range, ReducedRowMajor, make_range

__all__ = ["canon", "promote", "jnp_dtype", "is_df", "Range", "ReducedRowMajor", "make_range"]
