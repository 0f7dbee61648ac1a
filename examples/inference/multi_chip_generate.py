"""Multi-chip tensor-parallel generation (net-new vs the reference, whose
multi-GPU story is accelerate layer placement that its own README shows
running SLOWER than one GPU — README.md:36-37).

Shards a quantized model megatron-style over a ("dp", "tp") mesh and runs
the WHOLE generate loop under jax.shard_map, so every chip executes the
fused Pallas kernel on its local weight shard. Output tokens are identical
to single-device generate.

    python examples/inference/multi_chip_generate.py \
        --quantized_model_dir /path/to/quantized --tp 4 [--dp 2] \
        --prompt "TPUs are" --max_new_tokens 64 [--num_beams 4] [--kv_quant]

On a multi-host slice, call autogptq_tpu.parallel.multihost_initialize()
first (or set COORDINATOR_ADDRESS) and run one process per host.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantized_model_dir", required=True)
    ap.add_argument("--tp", type=int, required=True)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--max_new_tokens", type=int, default=64)
    ap.add_argument("--num_beams", type=int, default=1)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--kv_quant", action="store_true")
    ap.add_argument("--verify_vs_single_chip", action="store_true")
    args = ap.parse_args()

    import jax

    from autogptq_tpu import AutoGPTQForCausalLM
    from autogptq_tpu.parallel import make_mesh, multihost_initialize
    from autogptq_tpu.parallel.tp import TPModel

    multihost_initialize()
    n = args.dp * args.tp
    model = AutoGPTQForCausalLM.from_quantized(args.quantized_model_dir)

    tok = None
    if args.prompt:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.quantized_model_dir)
        ids = np.asarray([tok(args.prompt)["input_ids"]], np.int32)
    else:
        ids = (np.arange(16, dtype=np.int32)[None, :] % 1000) + 1
    if args.dp > 1:  # batch must be divisible by dp; replicate the prompt
        ids = np.repeat(ids, args.dp, axis=0)

    mesh = make_mesh(tp=args.tp, dp=args.dp, devices=jax.devices()[:n])
    tpm = TPModel(model, mesh=mesh, dp_axis="dp" if args.dp > 1 else None)
    print(f"mesh: dp={args.dp} x tp={args.tp} over {n} devices")

    from autogptq_tpu.utils import generation

    kw = dict(max_new_tokens=args.max_new_tokens, num_beams=args.num_beams,
              temperature=args.temperature, kv_quant=args.kv_quant)
    generation.generate(tpm, ids, **kw)  # warmup/compile
    t0 = time.perf_counter()
    out = generation.generate(tpm, ids, **kw)
    dt = time.perf_counter() - t0
    print(f"{out.shape[0] * args.max_new_tokens / dt:.1f} tok/s aggregate")

    text = tok.decode(out[0]) if tok is not None else out[0].tolist()
    print("output:", text)

    if args.verify_vs_single_chip:
        from autogptq_tpu.utils import generation

        ref = generation.generate(model, ids, **kw)
        assert np.array_equal(out, ref), "sharded != single-device tokens"
        print("verified: sharded tokens == single-device tokens")


if __name__ == "__main__":
    main()
