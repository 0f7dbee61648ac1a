"""Wikitext-2-style perplexity benchmark (reference analog:
examples/benchmark/perplexity.py).

Air-gapped usage: pass a local text file (one document per line) instead of
downloading wikitext from the Hub.

    python examples/benchmark/perplexity.py MODEL_DIR TEXT_FILE \
        [--quantized] [--n_ctx 512] [--n_batch 512]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("text_file")
    ap.add_argument("--quantized", action="store_true",
                    help="load with from_quantized (default: from_pretrained)")
    ap.add_argument("--n_ctx", type=int, default=512)
    ap.add_argument("--n_batch", type=int, default=512)
    args = ap.parse_args()

    from transformers import AutoTokenizer

    from autogptq_tpu import AutoGPTQForCausalLM
    from autogptq_tpu.utils.perplexity import Perplexity, prepare_text

    tokenizer = AutoTokenizer.from_pretrained(args.model_dir)
    if args.quantized:
        model = AutoGPTQForCausalLM.from_quantized(args.model_dir)
    else:
        model = AutoGPTQForCausalLM.from_pretrained(args.model_dir)

    with open(args.text_file) as f:
        text = prepare_text(f.read().splitlines())
    tokens = np.asarray(tokenizer(text)["input_ids"], np.int32)

    ppl = Perplexity(model, tokens=tokens, bos_token_id=tokenizer.bos_token_id)
    values = ppl.calculate_perplexity(n_ctx=args.n_ctx, n_batch=args.n_batch)
    print(f"perplexity ({len(values)} windows): {values[-1]:.4f}")


if __name__ == "__main__":
    main()
