#!/bin/bash
# Sequential bench.py A/B sweep on the real chip — COMBO first, then each
# knob individually. bench.py self-retries backend init/tunnel flaps, so
# each entry is one invocation with a generous outer timeout.
#
# Knobs under test (all default-off; r2-measured config is the baseline):
#   AOZORA_FLASH_MIN_KV=1024|512  flash dispatch threshold (default 2048)
#   AOZORA_CONV_BWD=gemm2         dgrad conv as 9-tap dot_general / 4-phase GEMM
#   AOZORA_FUSED_QKV=1            one wide GEMM for q/k/v
#   AOZORA_NORM_IMPL=dot          flat bf16 self-dot grad-norm (fp32 accum)
#   AOZORA_XLA_ATTN=bf16probs     bf16 S^2 softmax residuals on XLA-attn levels
set -u
LOG=${LOG:-/tmp/bench_ab.log}
OUT=${OUT:-/tmp/bench_ab_results.jsonl}
cd /root/repo
run() {
  local tag="$1"; shift
  echo "=== bench [$tag] start $(date +%H:%M:%S) ===" | tee -a "$LOG"
  # shellcheck disable=SC2086
  line=$(timeout -k 30 3000 env $* python bench.py 2>>"$LOG" | tail -1)
  rc=$?
  echo "=== bench [$tag] rc=$rc $(date +%H:%M:%S): $line ===" | tee -a "$LOG"
  if [ -n "$line" ]; then echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"; fi
}
run baseline AOZORA_NOOP=1
run combo AOZORA_FLASH_MIN_KV=1024 AOZORA_CONV_BWD=gemm2 AOZORA_FUSED_QKV=1 AOZORA_NORM_IMPL=dot
run flash1024 AOZORA_FLASH_MIN_KV=1024
run fusedqkv AOZORA_FUSED_QKV=1
run gemm2 AOZORA_CONV_BWD=gemm2
run normdot AOZORA_NORM_IMPL=dot
run bf16probs AOZORA_XLA_ATTN=bf16probs
run flash512 AOZORA_FLASH_MIN_KV=512
echo "=== sweep done $(date +%H:%M:%S) ===" | tee -a "$LOG"
