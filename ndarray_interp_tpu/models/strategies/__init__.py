from .base import (
    Interp1DStrategy,
    Interp1DStrategyBuilder,
    PointwiseStrategy,
)
from .linear import Linear

__all__ = [
    "Interp1DStrategy",
    "Interp1DStrategyBuilder",
    "PointwiseStrategy",
    "Linear",
]
