from .gather import gather_rows
from .lerp import calc_frac
from .pallas_eval import can_use_fused, fused_eval_1d, make_interval_table
from .pallas_thomas import thomas_solve_fast
from .searchsorted import get_lower_index, is_in_range
from .thomas import thomas_solve

__all__ = [
    "calc_frac",
    "can_use_fused",
    "fused_eval_1d",
    "gather_rows",
    "get_lower_index",
    "is_in_range",
    "make_interval_table",
    "thomas_solve",
    "thomas_solve_fast",
]
