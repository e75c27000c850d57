from .interp1d import Interp1D, Interp1DBuilder

__all__ = ["Interp1D", "Interp1DBuilder"]
