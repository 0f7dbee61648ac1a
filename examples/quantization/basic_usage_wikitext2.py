"""Quantize with wikitext-2 calibration data and evaluate perplexity.

Mirrors the reference recipe (examples/quantization/basic_usage_wikitext2.py):
random 2048-token windows from the train split for calibration, sliding-window
PPL on the test split. Air-gapped: pass a local wikitext directory containing
wiki.train.raw / wiki.test.raw (or any text files).

Usage:
    python examples/quantization/basic_usage_wikitext2.py \
        /path/to/hf-model /path/to/wikitext-2-raw /tmp/out [nsamples]
"""

import os
import sys

import numpy as np

from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig
from autogptq_tpu.utils.perplexity import Perplexity


def get_wikitext2(tokenizer, data_dir, nsamples=128, seqlen=2048, seed=0):
    with open(os.path.join(data_dir, "wiki.train.raw"), encoding="utf-8") as f:
        train_text = f.read()
    with open(os.path.join(data_dir, "wiki.test.raw"), encoding="utf-8") as f:
        test_text = f.read()

    train_ids = np.asarray(tokenizer(train_text, return_tensors="np").input_ids[0])
    rng = np.random.default_rng(seed)
    examples = []
    for _ in range(nsamples):
        i = rng.integers(0, len(train_ids) - seqlen - 1)
        examples.append({"input_ids": train_ids[i : i + seqlen]})
    return examples, test_text


def main():
    model_dir, data_dir, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    nsamples = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_dir)
    examples, test_text = get_wikitext2(tokenizer, data_dir, nsamples)

    quantize_config = BaseQuantizeConfig(bits=4, group_size=128, desc_act=True)
    model = AutoGPTQForCausalLM.from_pretrained(model_dir, quantize_config=quantize_config)
    model.quantize(examples, batch_size=1)
    model.save_quantized(out_dir)

    model = AutoGPTQForCausalLM.from_quantized(out_dir)
    ppl = Perplexity(model, tokenizer=tokenizer, text=test_text)
    scores = ppl.calculate_perplexity(n_ctx=512)
    print(f"wikitext-2 PPL (n_ctx=512): {scores[-1]:.4f}")


if __name__ == "__main__":
    main()
