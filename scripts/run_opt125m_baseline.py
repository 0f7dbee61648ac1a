"""BASELINE config 1: OPT-125M g128 quantize + PPL, fully CPU-runnable.

Builds a REAL-SIZED OPT-125M (random init — the box is air-gapped, so
absolute PPL is meaningless; the int4-vs-fp PPL DELTA on the same weights
and token stream is the machinery check), quantizes it 4-bit g128 through
the public API, and reports both PPLs + the delta.

    python scripts/run_opt125m_baseline.py [--samples 8] [--ctx 256]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--seq_len", type=int, default=256)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--work_dir", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch
    import transformers

    from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig
    from autogptq_tpu.utils.perplexity import Perplexity

    work = args.work_dir or tempfile.mkdtemp(prefix="opt125m_")
    fp_dir = os.path.join(work, "fp")
    q_dir = os.path.join(work, "q")

    cfg = transformers.OPTConfig()  # stock facebook/opt-125m architecture
    torch.manual_seed(0)
    t0 = time.perf_counter()
    transformers.OPTForCausalLM(cfg).save_pretrained(fp_dir, safe_serialization=True)
    print(f"built OPT-125M ({cfg.hidden_size}h x {cfg.num_hidden_layers}L) "
          f"in {time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    stream = rng.integers(4, cfg.vocab_size, size=(8 * args.ctx,)).astype(np.int32)

    fp_model = AutoGPTQForCausalLM.from_pretrained(fp_dir, dtype=jnp.float32)
    ppl_fp = Perplexity(fp_model, tokens=stream, bos_token_id=2).calculate_perplexity(
        n_ctx=args.ctx)[-1]

    qc = BaseQuantizeConfig(bits=4, group_size=128, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(fp_dir, quantize_config=qc,
                                                dtype=jnp.float32)
    examples = [
        {"input_ids": rng.integers(4, cfg.vocab_size, size=(args.seq_len,))}
        for _ in range(args.samples)
    ]
    t0 = time.perf_counter()
    model.quantize(examples, batch_size=4)
    tq = time.perf_counter() - t0
    model.save_quantized(q_dir)

    q_model = AutoGPTQForCausalLM.from_quantized(q_dir, dtype=jnp.float32)
    ppl_q = Perplexity(q_model, tokens=stream, bos_token_id=2).calculate_perplexity(
        n_ctx=args.ctx)[-1]

    print(json.dumps({
        "metric": "opt125m_g128_cpu_quantize_ppl",
        "ppl_fp32": round(float(ppl_fp), 4),
        "ppl_int4_g128": round(float(ppl_q), 4),
        "ppl_delta": round(float(ppl_q - ppl_fp), 4),
        "quantize_seconds": round(tq, 1),
    }))


if __name__ == "__main__":
    main()
