#!/bin/bash
# Sequential bench.py A/B sweep on the real chip — leave-one-out attribution
# of the r3 COMBO win (VERDICT r3 #1).  bench.py self-retries backend
# init/tunnel flaps, so each entry is one invocation with a generous outer
# timeout.  REPS runs per config (default 3) interleaved round-robin so a
# slow drift in the tunnel doesn't bias one config.
#
# Knobs under test (since the r4 default flip, flash1024/gemm2/fusedqkv are
# the CODE defaults — every tag pins all four knobs explicitly so the sweep
# stays meaningful regardless of what the defaults are):
#   AOZORA_FLASH_MIN_KV           flash dispatch threshold (r2 legacy: 2048)
#   AOZORA_CONV_BWD               dgrad conv backward: gemm2 | xla (legacy)
#   AOZORA_FUSED_QKV              one wide GEMM for q/k/v: 1 | 0 (legacy)
#   AOZORA_NORM_IMPL              grad-norm: dot | default (not flipped; see
#                                 CLAUDE.md r4 attribution note)
set -u
LOG=${LOG:-/tmp/bench_ab.log}
OUT=${OUT:-/tmp/bench_ab_results.jsonl}
REPS=${REPS:-3}
cd /root/repo
run() {
  local tag="$1"; shift
  echo "=== bench [$tag] start $(date +%H:%M:%S) ===" | tee -a "$LOG"
  local tmp=/tmp/bench_ab_last.out
  # shellcheck disable=SC2086
  timeout -k 30 3000 env $* python bench.py >"$tmp" 2>>"$LOG"
  local rc=$?
  local line
  line=$(tail -1 "$tmp")
  echo "=== bench [$tag] rc=$rc $(date +%H:%M:%S): $line ===" | tee -a "$LOG"
  # only append valid JSON result lines (a failed run can leave garbage)
  if [ "$rc" -eq 0 ] && [ -n "$line" ]; then
    case "$line" in
      "{"*) echo "{\"tag\": \"$tag\", \"rep\": $rep, \"result\": $line}" >> "$OUT" ;;
      *) echo "=== bench [$tag] SKIPPED non-JSON line ===" | tee -a "$LOG" ;;
    esac
  fi
}
for rep in $(seq 1 "$REPS"); do
  run baseline       AOZORA_FLASH_MIN_KV=2048 AOZORA_CONV_BWD=xla AOZORA_FUSED_QKV=0
  run combo          AOZORA_FLASH_MIN_KV=1024 AOZORA_CONV_BWD=gemm2 AOZORA_FUSED_QKV=1 AOZORA_NORM_IMPL=dot
  run loo-flash1024  AOZORA_FLASH_MIN_KV=2048 AOZORA_CONV_BWD=gemm2 AOZORA_FUSED_QKV=1 AOZORA_NORM_IMPL=dot
  run loo-gemm2      AOZORA_FLASH_MIN_KV=1024 AOZORA_CONV_BWD=xla AOZORA_FUSED_QKV=1 AOZORA_NORM_IMPL=dot
  run loo-fusedqkv   AOZORA_FLASH_MIN_KV=1024 AOZORA_CONV_BWD=gemm2 AOZORA_FUSED_QKV=0 AOZORA_NORM_IMPL=dot
  run loo-normdot    AOZORA_FLASH_MIN_KV=1024 AOZORA_CONV_BWD=gemm2 AOZORA_FUSED_QKV=1
done
echo "=== sweep done $(date +%H:%M:%S) ===" | tee -a "$LOG"
