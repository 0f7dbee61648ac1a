"""Continuous-batching serving example (net-new vs the reference, which has
no serving layer): load a quantized checkpoint, run a mixed workload of
requests through the slot-based engine — chunked prefill interleaved with
decode, per-request sampling — optionally tensor-parallel over every
available chip.

    python examples/serving/continuous_batching.py \
        --quantized_model_dir /path/to/quantized \
        --prompts "Hello there" "Write a poem about TPUs" \
        --max_new_tokens 64 --temperature 0.8 --top_p 0.95 --tp 0

``--tp N`` shards the engine over N devices (0 = single-chip).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantized_model_dir", required=True)
    ap.add_argument("--prompts", nargs="+", default=None,
                    help="text prompts (requires a tokenizer in the model dir); "
                         "omit to run random-token prompts")
    ap.add_argument("--num_random_requests", type=int, default=4)
    ap.add_argument("--max_new_tokens", type=int, default=32)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top_p", type=float, default=1.0)
    ap.add_argument("--top_k", type=int, default=0)
    ap.add_argument("--max_slots", type=int, default=4)
    ap.add_argument("--max_seq_len", type=int, default=512)
    ap.add_argument("--prefill_chunk", type=int, default=128)
    ap.add_argument("--kv_quant", action="store_true")
    ap.add_argument("--tp", type=int, default=0,
                    help="tensor-parallel ways (0 = single chip)")
    ap.add_argument("--paged", action="store_true",
                    help="use the paged-KV engine (vLLM-style shared page "
                         "pool; cache memory scales with resident tokens)")
    ap.add_argument("--total_pages", type=int, default=128)
    ap.add_argument("--page_size", type=int, default=16)
    ap.add_argument("--draft_model_dir", default=None,
                    help="quantized draft model for SPECULATIVE serving "
                         "(greedy workloads; token-identical output)")
    ap.add_argument("--spec_gamma", type=int, default=4)
    args = ap.parse_args()

    import jax

    from autogptq_tpu import AutoGPTQForCausalLM
    from autogptq_tpu.serving import ContinuousBatchEngine, Request

    model = AutoGPTQForCausalLM.from_quantized(args.quantized_model_dir)
    if args.tp:
        from autogptq_tpu.parallel import make_mesh
        from autogptq_tpu.parallel.tp import TPModel

        mesh = make_mesh(tp=args.tp, devices=jax.devices()[: args.tp])
        model = TPModel(model, mesh=mesh)
        print(f"sharded over {args.tp} devices (megatron TP, cache heads on 'tp')")

    tok = None
    if args.prompts:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.quantized_model_dir)
        prompt_ids = [
            np.asarray(tok(p)["input_ids"], np.int32) for p in args.prompts
        ]
    else:
        rng = np.random.default_rng(0)
        cfg = model.cfg
        prompt_ids = [
            rng.integers(1, cfg.vocab_size, size=(int(n),)).astype(np.int32)
            for n in rng.integers(4, 48, args.num_random_requests)
        ]

    if args.paged and args.draft_model_dir:
        ap.error("--draft_model_dir requires the contiguous engine "
                 "(speculative serving is not supported with --paged)")
    if args.paged:
        from autogptq_tpu.serving_paged import PagedContinuousBatchEngine

        engine = PagedContinuousBatchEngine(
            model, max_slots=args.max_slots, total_pages=args.total_pages,
            page_size=args.page_size,
            pages_per_seq=-(-args.max_seq_len // args.page_size),
        )
    else:
        draft = (AutoGPTQForCausalLM.from_quantized(args.draft_model_dir)
                 if args.draft_model_dir else None)
        engine = ContinuousBatchEngine(
            model, max_slots=args.max_slots, max_seq_len=args.max_seq_len,
            kv_quant=args.kv_quant, prefill_chunk=args.prefill_chunk,
            draft_model=draft, spec_gamma=args.spec_gamma,
        )
    reqs = [
        Request(
            req_id=i, prompt=p, max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, top_p=args.top_p, top_k=args.top_k,
            seed=i,
        )
        for i, p in enumerate(prompt_ids)
    ]

    t0 = time.perf_counter()
    results = engine.run(reqs)
    dt = time.perf_counter() - t0
    total = sum(len(v) for v in results.values())
    for rid in sorted(results):
        out = results[rid]
        text = tok.decode(out) if tok is not None else out.tolist()
        print(f"[req {rid}] {len(out)} tokens: {text}")
    print(f"{total} tokens in {dt:.2f}s = {total / dt:.1f} aggregate tok/s")
    print(f"engine stats: {engine.stats.snapshot()}")


if __name__ == "__main__":
    main()
