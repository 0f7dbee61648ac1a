from . import gemm

__all__ = ["gemm"]
