"""Quantize an HF model and run generation — the canonical recipe.

Mirrors the reference example (examples/quantization/basic_usage.py):
tokenize a couple of calibration sentences, quantize to 4-bit, save, reload,
generate.

Usage:
    python examples/quantization/basic_usage.py /path/to/hf-model /tmp/out
"""

import sys

import numpy as np

from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig


def main():
    model_dir, out_dir = sys.argv[1], sys.argv[2]

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_dir)
    examples = [
        {"input_ids": np.asarray(tokenizer(text)["input_ids"])}
        for text in [
            "autogptq_tpu is an easy-to-use model quantization library "
            "with user-friendly apis, based on the GPTQ algorithm.",
            "The quick brown fox jumps over the lazy dog.",
        ]
    ]

    quantize_config = BaseQuantizeConfig(bits=4, group_size=128, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(model_dir, quantize_config=quantize_config)
    model.quantize(examples)
    model.save_quantized(out_dir)

    model = AutoGPTQForCausalLM.from_quantized(out_dir)
    ids = np.asarray(tokenizer("autogptq_tpu is")["input_ids"], np.int32)
    out = model.generate(ids, max_new_tokens=32, eos_token_id=tokenizer.eos_token_id)
    print(tokenizer.decode(out[0]))


if __name__ == "__main__":
    main()
