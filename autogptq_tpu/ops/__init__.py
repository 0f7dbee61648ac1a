from . import packing

__all__ = ["packing"]
