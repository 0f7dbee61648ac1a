"""Compare base-fp vs quantized on sequence classification via generation +
Levenshtein closest-label voting (reference analog:
examples/evaluation/run_sequence_classification_task.py, which uses the
cola subset of glue).

Data: a JSON list of {"prompt": ..., "label": "<one of --labels>"} rows.

    python examples/evaluation/run_sequence_classification_task.py \
        --base_model_dir M1 --quantized_model_dir M2 --data data.json \
        --labels negative positive
"""

import argparse
import json

from transformers import AutoTokenizer

from autogptq_tpu import AutoGPTQForCausalLM
from autogptq_tpu.eval_tasks import SequenceClassificationTask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_model_dir", required=True)
    ap.add_argument("--quantized_model_dir", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--labels", nargs="+", default=["negative", "positive"])
    args = ap.parse_args()

    with open(args.data) as f:
        rows = json.load(f)
    tokenizer = AutoTokenizer.from_pretrained(args.base_model_dir)

    for name, loader in (
        ("fp", lambda: AutoGPTQForCausalLM.from_pretrained(args.base_model_dir)),
        ("quantized", lambda: AutoGPTQForCausalLM.from_quantized(args.quantized_model_dir)),
    ):
        model = loader()
        task = SequenceClassificationTask(model, tokenizer, rows, classes=args.labels)
        print(f"{name} eval: {task.run()}")
        del model


if __name__ == "__main__":
    main()
