"""Generation-speed benchmark (the README protocol of the reference:
examples/benchmark/generation_speed.py — tokens/s = generated tokens /
generate() wall time, forced min-new-tokens).

Usage:
    python examples/benchmark/generation_speed.py /path/to/quantized-model \
        [--num_beams 1] [--new_tokens 512]
"""

import argparse
import time

import numpy as np

from autogptq_tpu import AutoGPTQForCausalLM


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--num_beams", type=int, default=1)
    ap.add_argument("--new_tokens", type=int, default=512)
    ap.add_argument("--prompt_len", type=int, default=16)
    ap.add_argument("--fp", action="store_true", help="load unquantized")
    args = ap.parse_args()

    loader = (
        AutoGPTQForCausalLM.from_pretrained if args.fp else AutoGPTQForCausalLM.from_quantized
    )
    model = loader(args.model_dir)

    prompt = (np.arange(args.prompt_len, dtype=np.int32)[None, :] % 1000)

    # compile warmup (not counted)
    model.generate(prompt, max_new_tokens=args.new_tokens, num_beams=args.num_beams,
                   min_new_tokens=args.new_tokens)

    t0 = time.perf_counter()
    model.generate(prompt, max_new_tokens=args.new_tokens, num_beams=args.num_beams,
                   min_new_tokens=args.new_tokens)
    dt = time.perf_counter() - t0
    print(f"{args.new_tokens} tokens in {dt:.2f}s -> {args.new_tokens / dt:.2f} tokens/s")


if __name__ == "__main__":
    main()
