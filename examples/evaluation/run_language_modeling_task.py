"""Compare base-fp vs quantized on a language-modeling task (reference
analog: examples/evaluation/run_language_modeling_task.py).

Data: a JSON list of {"prompt": ..., "label": ...} rows (air-gapped stand-in
for the reference's tatsu-lab/alpaca slice).

    python examples/evaluation/run_language_modeling_task.py \
        --base_model_dir M1 --quantized_model_dir M2 --data data.json
"""

import argparse
import json

from transformers import AutoTokenizer

from autogptq_tpu import AutoGPTQForCausalLM
from autogptq_tpu.eval_tasks import LanguageModelingTask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_model_dir", required=True)
    ap.add_argument("--quantized_model_dir", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--sample_max_len", type=int, default=1024)
    args = ap.parse_args()

    with open(args.data) as f:
        rows = json.load(f)
    tokenizer = AutoTokenizer.from_pretrained(args.base_model_dir)

    base = AutoGPTQForCausalLM.from_pretrained(args.base_model_dir)
    task = LanguageModelingTask(base, tokenizer, rows)
    print(f"fp eval: {task.run()}")
    del base

    quant = AutoGPTQForCausalLM.from_quantized(args.quantized_model_dir)
    task = LanguageModelingTask(quant, tokenizer, rows)
    print(f"quantized eval: {task.run()}")


if __name__ == "__main__":
    main()
