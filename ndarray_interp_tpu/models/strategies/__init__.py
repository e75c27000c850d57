from .base import (
    Interp1DStrategy,
    Interp1DStrategyBuilder,
    PointwiseStrategy,
)
from .base2d import (
    Interp2DStrategy,
    Interp2DStrategyBuilder,
    PointwiseStrategy2D,
)
from .bicubic import Bicubic, BicubicStrategy, bicubic_node_grids
from .bilinear import Bilinear
from .cubic import BoundaryCondition, CubicSpline, RowBoundary, SingleBoundary
from .hermite import Akima, Makima, Pchip
from .linear import Linear
from .step import Nearest, Nearest2D

__all__ = [
    "Interp1DStrategy",
    "Interp1DStrategyBuilder",
    "PointwiseStrategy",
    "Interp2DStrategy",
    "Interp2DStrategyBuilder",
    "PointwiseStrategy2D",
    "Akima",
    "Makima",
    "Bicubic",
    "BicubicStrategy",
    "bicubic_node_grids",
    "Bilinear",
    "BoundaryCondition",
    "CubicSpline",
    "Pchip",
    "RowBoundary",
    "SingleBoundary",
    "Linear",
    "Nearest",
    "Nearest2D",
]
