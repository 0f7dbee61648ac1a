"""AutoGPTQForCausalLM: model_type-dispatched factory (reference:
/root/reference/auto_gptq/modeling/auto.py:35-168). Dispatch is by the HF
config's model_type against the family registry."""

from __future__ import annotations

from typing import Optional

from ..quantization import BaseQuantizeConfig
from ..utils import hf_io
from .base import GPTQModel
from .registry import REGISTRY


class AutoGPTQForCausalLM:
    def __init__(self):
        raise EnvironmentError(
            "AutoGPTQForCausalLM is designed to be instantiated using "
            "`AutoGPTQForCausalLM.from_pretrained` or "
            "`AutoGPTQForCausalLM.from_quantized`."
        )

    @classmethod
    def check_and_get_model_type(cls, model_dir: str) -> str:
        model_type = hf_io.load_hf_config(model_dir)["model_type"]
        if model_type not in REGISTRY:
            raise TypeError(f"{model_type} isn't supported yet.")
        return model_type

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: str,
        quantize_config: Optional[BaseQuantizeConfig] = None,
        **kwargs,
    ) -> GPTQModel:
        model_dir = hf_io.resolve_model_dir(
            pretrained_model_name_or_path, kwargs.get("revision")
        )
        cls.check_and_get_model_type(model_dir)
        return GPTQModel.from_pretrained(
            model_dir, quantize_config=quantize_config, **kwargs
        )

    @classmethod
    def from_quantized(
        cls, model_name_or_path: str, **kwargs
    ) -> GPTQModel:
        model_dir = hf_io.resolve_model_dir(
            model_name_or_path, kwargs.get("revision")
        )
        cls.check_and_get_model_type(model_dir)
        return GPTQModel.from_quantized(model_dir, **kwargs)


__all__ = ["AutoGPTQForCausalLM"]
