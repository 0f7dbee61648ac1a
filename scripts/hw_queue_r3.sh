#!/bin/bash
# Round-3 hardware measurement queue (run when the axon tunnel is back).
# ONE TPU process at a time — the tunnel serializes clients. Each step logs
# to /tmp/hw_r3/. Order = priority; later steps are fine to interrupt.
set -u
mkdir -p /tmp/hw_r3
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-2400}" "$@" > "/tmp/hw_r3/$name.log" 2>&1
  echo "--- exit $? ; tail:"
  tail -5 "/tmp/hw_r3/$name.log"
}

# 1. headline A/B/C: shipped kb32 default vs ki32 vs linearized kb32l
run bench_kb32  python bench.py
run bench_ki32  env BENCH_LAYOUT=ki32 python bench.py
run bench_kb32l env BENCH_LAYOUT=kb32l python bench.py
# quantized-lm_head-as-default decision (VERDICT weak #10): +4% was the
# round-2 number; re-measure on the winning layout
run bench_lmq   env BENCH_QUANT_LMHEAD=1 python bench.py
# shape autotune pass: measures N-tiles for the real 7B shapes (incl. the
# K=11008/11264 down_proj off the 4096^2 sweet spot) and persists the
# profile; compare against the heuristic-tile runs above
run bench_autotune env AUTOGPTQ_TPU_AUTOTUNE=1 python bench.py

# manual nbuf-deep pipelined kb32l decode (Marlin 4-stage analog):
# numerics/race smoke FIRST (interpret mode can't catch on-device DMA
# ordering), then the e2e A/B
run smoke_kb32l_m python scripts/smoke_kb32l_manual.py
run bench_kb32l_m3 env BENCH_LAYOUT=kb32l AUTOGPTQ_TPU_KB32L_MANUAL=3 python bench.py
run bench_kb32l_m4 env BENCH_LAYOUT=kb32l AUTOGPTQ_TPU_KB32L_MANUAL=4 python bench.py

# 2. DMA ceiling probe (block sweep, side streams, tile-contiguous, manual)
run dma_probe python scripts/kernel_dma_probe.py

# 3. beam step decomposition (T1 weights / T2 paged-attn / T3 scatter /
#    T4 unembed / T5 page copy) + beam e2e
run beam_profile python scripts/bench_beam_profile.py 512
run beam_e2e    python scripts/bench_beam.py
run beam_int8   env BENCH_KV_QUANT=1 python scripts/bench_beam.py

# 4. batched serving efficiency (window-bucketed decode landed this round)
run batch8 python scripts/bench_batch.py

# 5. 7B checkpoint load re-measure (native fused repack landed)
run e2e_ckpt python scripts/bench_e2e_checkpoint.py 512 /tmp/bench_e2e_llama7b_gptq

# 6. serving engines under concurrent load (contiguous + paged)
run serving python scripts/bench_serving_engines.py

# 7. grouped GPTQ solver speed
run solver python scripts/bench_solver.py

# 8. per-width table incl. 3-bit row + true-3-bit probe
run widths python scripts/bench_widths.py
run k3i32  python scripts/kernel_k3i32_probe.py

# 9. prefill e2e TFLOP/s (flash now fed bf16 — verify numerics + speed)
run prefill python scripts/bench_prefill.py

# 10. MoE routed-expert decode
run moe python scripts/bench_moe.py

echo "ALL DONE — logs in /tmp/hw_r3/"
