from . import hf_io

__all__ = ["hf_io"]
