"""Quantize with instruction-formatted calibration data + smart batching
(reference analog: examples/quantization/quant_with_alpaca.py).

Data: a JSON list of {"instruction": ..., "output": ...} rows.

    python examples/quantization/quant_with_alpaca.py \
        --pretrained_model_dir M --quantized_model_dir OUT --data data.json
"""

import argparse
import json

import numpy as np
from transformers import AutoTokenizer

from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig

TEMPLATE = "### Instruction:\n{instruction}\n\n### Response:\n{output}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained_model_dir", required=True)
    ap.add_argument("--quantized_model_dir", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--group_size", type=int, default=128)
    ap.add_argument("--desc_act", action="store_true")
    ap.add_argument("--num_samples", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=4)
    args = ap.parse_args()

    tokenizer = AutoTokenizer.from_pretrained(args.pretrained_model_dir)
    with open(args.data) as f:
        rows = json.load(f)[: args.num_samples]
    examples = [
        {"input_ids": np.asarray(tokenizer(TEMPLATE.format(**r))["input_ids"])}
        for r in rows
    ]

    qc = BaseQuantizeConfig(
        bits=args.bits, group_size=args.group_size, desc_act=args.desc_act
    )
    model = AutoGPTQForCausalLM.from_pretrained(args.pretrained_model_dir, quantize_config=qc)
    model.quantize(examples, batch_size=args.batch_size)
    model.save_quantized(args.quantized_model_dir)
    print(f"quantized model saved to {args.quantized_model_dir}")


if __name__ == "__main__":
    main()
