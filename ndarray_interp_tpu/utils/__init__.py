from .monotonic import Monotonic, MonotonicKind, monotonic_prop

__all__ = ["Monotonic", "MonotonicKind", "monotonic_prop"]
