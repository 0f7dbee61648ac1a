"""Speculative decoding example (net-new vs the reference): a small draft
model proposes tokens, the target verifies — output is token-identical to
the target's own greedy decode, faster when the draft agrees often.

    python examples/inference/speculative_decoding.py \
        --quantized_model_dir /path/to/target \
        --draft_model_dir /path/to/draft \
        --max_new_tokens 128 --gamma 4 [--verify]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantized_model_dir", required=True)
    ap.add_argument("--draft_model_dir", required=True)
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--max_new_tokens", type=int, default=64)
    ap.add_argument("--gamma", type=int, default=4,
                    help="draft tokens proposed per verification step")
    ap.add_argument("--verify", action="store_true",
                    help="also run plain greedy and assert token equality")
    args = ap.parse_args()

    from autogptq_tpu import AutoGPTQForCausalLM

    target = AutoGPTQForCausalLM.from_quantized(args.quantized_model_dir)
    draft = AutoGPTQForCausalLM.from_quantized(args.draft_model_dir)

    tok = None
    if args.prompt:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.quantized_model_dir)
        ids = np.asarray([tok(args.prompt)["input_ids"]], np.int32)
    else:
        ids = (np.arange(12, dtype=np.int32)[None, :] % 1000) + 1

    # warmup/compile both paths
    target.generate(ids, max_new_tokens=args.max_new_tokens,
                    draft_model=draft, speculative_gamma=args.gamma)

    t0 = time.perf_counter()
    out = target.generate(ids, max_new_tokens=args.max_new_tokens,
                          draft_model=draft, speculative_gamma=args.gamma)
    dt = time.perf_counter() - t0
    text = tok.decode(out[0]) if tok is not None else out[0].tolist()
    print(f"speculative: {args.max_new_tokens / dt:.1f} tok/s")
    print("output:", text)

    if args.verify:
        ref = target.generate(ids, max_new_tokens=args.max_new_tokens)
        assert np.array_equal(out, ref), "speculative != plain greedy"
        print("verified: speculative tokens == plain greedy tokens")


if __name__ == "__main__":
    main()
