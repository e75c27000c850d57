from .lerp import calc_frac
from .searchsorted import get_lower_index, is_in_range
from .thomas import thomas_solve

__all__ = ["calc_frac", "get_lower_index", "is_in_range", "thomas_solve"]
