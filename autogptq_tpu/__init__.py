"""autogptq_tpu — a TPU-native GPTQ quantization & inference framework.

JAX/XLA/Pallas re-design of the capabilities of AutoGPTQ: GPTQ post-training
weight quantization for causal LMs (2/3/4/8-bit, grouped, act-order),
reference-compatible checkpoint I/O, and quantized inference with fused
Pallas dequant-matmul kernels, sharded over TPU meshes via GSPMD.
"""

__version__ = "0.1.0"

from .models.auto import AutoGPTQForCausalLM
from .models.base import GPTQModel
from .quantization import BaseQuantizeConfig
from .utils.exllama_compat import exllama_set_max_input_length
from .utils.peft import GPTQLoraConfig, get_gptq_peft_model

__all__ = [
    "AutoGPTQForCausalLM",
    "GPTQModel",
    "BaseQuantizeConfig",
    "GPTQLoraConfig",
    "get_gptq_peft_model",
    "exllama_set_max_input_length",
    "__version__",
]
