from .config import (
    BaseQuantizeConfig,
    CHECKPOINT_FORMAT,
    QUANT_CONFIG_FILENAME,
    QUANT_METHOD,
    QUANTIZE_BLACK_LIST,
)
from .gptq import GPTQConfig, GPTQResult, gptq_quantize, hessian_init, hessian_update
from .quantizer import QuantizerConfig, find_params, find_params_tensor, quantize_rtn

__all__ = [
    "BaseQuantizeConfig",
    "CHECKPOINT_FORMAT",
    "QUANT_METHOD",
    "QUANT_CONFIG_FILENAME",
    "QUANTIZE_BLACK_LIST",
    "GPTQConfig",
    "GPTQResult",
    "gptq_quantize",
    "hessian_init",
    "hessian_update",
    "QuantizerConfig",
    "find_params",
    "find_params_tensor",
    "quantize_rtn",
]
