from .interp1d import Interp1D, Interp1DBuilder
from .interp2d import Interp2D, Interp2DBuilder

__all__ = ["Interp1D", "Interp1DBuilder", "Interp2D", "Interp2DBuilder"]
