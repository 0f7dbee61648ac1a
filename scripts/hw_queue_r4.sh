#!/bin/bash
# Round-4 hardware measurement queue. ONE TPU process at a time — the
# tunnel serializes clients (concurrent clients corrupt wall-time numbers:
# that is how round 3's driver bench read 108.5 while a clean run reads
# 140.9). Each step logs to /tmp/hw_r4/. Order = VERDICT-target priority.
set -u
mkdir -p /tmp/hw_r4
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-2400}" "$@" > "/tmp/hw_r4/$name.log" 2>&1
  echo "--- exit $? ; tail:"
  tail -5 "/tmp/hw_r4/$name.log"
}

# 0. numerics/race smoke for the manual kb32l DMA pipeline (must precede
#    its bench: interpret mode can't catch on-device DMA ordering)
run smoke_kb32l_m python scripts/smoke_kb32l_manual.py
# 1. headline candidates: manual nbuf-deep pipelined kb32l vs shipped kb32
run bench_kb32l_m3 env BENCH_LAYOUT=kb32l AUTOGPTQ_TPU_KB32L_MANUAL=3 python bench.py
run bench_kb32l_m4 env BENCH_LAYOUT=kb32l AUTOGPTQ_TPU_KB32L_MANUAL=4 python bench.py
run bench_kb32l    env BENCH_LAYOUT=kb32l python bench.py
# 2. beam (VERDICT target: >=320 bf16 / >=400 int8 agg tok/s)
run beam_e2e  python scripts/bench_beam.py
run beam_int8 env BENCH_KV_QUANT=1 python scripts/bench_beam.py
# 3. batched serving efficiency (target: batch-8 >= 730 agg tok/s)
run batch8 python scripts/bench_batch.py
# 4. prefill e2e (target: >= 120 TFLOP/s; flash now fed bf16)
run prefill python scripts/bench_prefill.py
# 5. per-width table incl. 3-bit rows
run widths python scripts/bench_widths.py
# 6. checkpoint load re-measure (native fused repack: target < 30 s)
run e2e_ckpt python scripts/bench_e2e_checkpoint.py 512 /tmp/bench_e2e_llama7b_gptq
# 7. serving engines under concurrent load (contiguous + paged + stats)
run serving python scripts/bench_serving_engines.py
# 8. grouped GPTQ solver speed (target: <= 4 s / 4096^2 layer)
run solver python scripts/bench_solver.py
# 9. MoE routed-expert decode
run moe python scripts/bench_moe.py
# 10. autotune pass + quantized-lm_head A/B on the winning layout
run bench_autotune env AUTOGPTQ_TPU_AUTOTUNE=1 python bench.py
run bench_lmq env BENCH_QUANT_LMHEAD=1 python bench.py
# 11. probes: true-3-bit layout, DMA ceiling, beam decomposition
run k3i32 python scripts/kernel_k3i32_probe.py
run dma_probe python scripts/kernel_dma_probe.py
run beam_profile python scripts/bench_beam_profile.py 512

echo "ALL DONE — logs in /tmp/hw_r4/"

# appended while running (bash reads incrementally): decode decomposition
run decode_profile python scripts/bench_decode_profile.py
echo "EXTRAS DONE"
# retry the int8 beam bench with the fixed 3-D scale-pool blocks
run beam_int8_fixed env BENCH_KV_QUANT=1 python scripts/bench_beam.py
echo "RETRY DONE"
run prefill_profile python scripts/bench_prefill_profile.py
echo "PROFILE DONE"
run upload_probe python scripts/upload_probe.py
echo "UPLOAD PROBE DONE"
run serving_r4 python scripts/bench_serving_engines.py
echo "SERVING R4 DONE"
