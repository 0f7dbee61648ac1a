from . import arch, params, registry
from .arch import ArchConfig, DenseLinear, KVCache
from .base import GPTQModel
from .registry import REGISTRY, FamilySpec, get_family

__all__ = [
    "arch",
    "params",
    "registry",
    "ArchConfig",
    "DenseLinear",
    "KVCache",
    "GPTQModel",
    "REGISTRY",
    "FamilySpec",
    "get_family",
]
