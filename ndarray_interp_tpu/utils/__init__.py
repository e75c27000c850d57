from .monotonic import Monotonic, MonotonicKind, monotonic_prop

__all__ = [
    "Monotonic",
    "MonotonicKind",
    "checkpoint",
    "monotonic_prop",
    "profiling",
]


def __getattr__(name):
    # lazy: checkpoint imports the interpolators, which import
    # utils.monotonic — eager imports here would be circular
    if name in ("checkpoint", "profiling"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
