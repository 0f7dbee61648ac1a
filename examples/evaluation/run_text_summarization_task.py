"""Compare base-fp vs quantized on summarization (rouge) (reference analog:
examples/evaluation/run_text_summarization_task.py, which uses xsum).

Data: a JSON list of {"prompt": ..., "summary": ...} rows.

    python examples/evaluation/run_text_summarization_task.py \
        --base_model_dir M1 --quantized_model_dir M2 --data data.json
"""

import argparse
import json

from transformers import AutoTokenizer

from autogptq_tpu import AutoGPTQForCausalLM
from autogptq_tpu.eval_tasks import TextSummarizationTask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_model_dir", required=True)
    ap.add_argument("--quantized_model_dir", required=True)
    ap.add_argument("--data", required=True)
    args = ap.parse_args()

    with open(args.data) as f:
        rows = json.load(f)
    tokenizer = AutoTokenizer.from_pretrained(args.base_model_dir)

    for name, loader in (
        ("fp", lambda: AutoGPTQForCausalLM.from_pretrained(args.base_model_dir)),
        ("quantized", lambda: AutoGPTQForCausalLM.from_quantized(args.quantized_model_dir)),
    ):
        model = loader()
        task = TextSummarizationTask(model, tokenizer, rows)
        print(f"{name} eval: {task.run()}")
        del model


if __name__ == "__main__":
    main()
