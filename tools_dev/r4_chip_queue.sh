#!/bin/bash
# Round-4 sequential chip work queue (run AFTER the full-size Anima phases
# free the chip):
#   1. bench.py with ZERO env knobs x2 — the r4 shipping-default number
#      (VERDICT r3 #1's "done" check: <= 0.241 s/img with no AOZORA_* set).
#   2. 1536px b1 micro-step, new defaults vs r2 legacy knobs (VERDICT r3
#      #5: below the 1016.3 ms r2 measurement).
#   3. defaults + normdot — the one combo knob NOT flipped (clean sample;
#      the LOO rep for it was tunnel-degraded).
#   4. a profiler trace of the shipping-default step for frontier mining
#      (VERDICT r3 #4).
# Results: /tmp/r4_queue_results.jsonl + trace under /tmp/r4_trace.
set -u
cd /root/repo
OUT=/tmp/r4_queue_results.jsonl
LOG=/tmp/r4_queue.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

run_bench() {  # run_bench <tag> [env...]
  local tag="$1"; shift
  echo "=== [$tag] start $(date +%H:%M:%S) ===" | tee -a "$LOG"
  local tmp=/tmp/r4_queue_last.out
  # shellcheck disable=SC2086
  timeout -k 30 3000 env "$@" python bench.py >"$tmp" 2>>"$LOG"
  local rc=$?
  local line; line=$(tail -1 "$tmp")
  echo "=== [$tag] rc=$rc: $line ===" | tee -a "$LOG"
  if [ "$rc" -eq 0 ]; then
    case "$line" in
      "{"*) echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT" ;;
    esac
  fi
}

run_probe() {  # run_probe <tag> <env...> -- <probe args...>
  local tag="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== [$tag] start $(date +%H:%M:%S) ===" | tee -a "$LOG"
  local tmp=/tmp/r4_queue_last.out
  timeout -k 30 3000 env "${envs[@]}" python tools_dev/perf_probe.py "$@" \
      >"$tmp" 2>>"$LOG"
  local rc=$?
  echo "=== [$tag] rc=$rc ===" | tee -a "$LOG"
  tail -3 "$tmp" | tee -a "$LOG"
  if [ "$rc" -eq 0 ]; then
    echo "{\"tag\": \"$tag\", \"probe\": \"$(tail -1 "$tmp" | tr '"' "'")\"}" >> "$OUT"
  fi
}

run_bench default-r4-a AOZORA_NOOP=1
run_bench default-r4-b AOZORA_NOOP=1
run_probe 1536-defaults AOZORA_NOOP=1 -- remat=1 batch=1 attn=flash latent=192
run_probe 1536-legacy AOZORA_FLASH_MIN_KV=2048 AOZORA_CONV_BWD=xla AOZORA_FUSED_QKV=0 \
    -- remat=1 batch=1 attn=flash latent=192
run_bench default-plus-normdot AOZORA_NORM_IMPL=dot
run_bench default-r4-c AOZORA_NOOP=1
mkdir -p /tmp/r4_trace
timeout -k 30 3000 python tools_dev/trace_probe.py model=sdxl attn=flash \
    remat=0 batch=1 latent=128 top=45 > /tmp/r4_trace/trace_sdxl_default.out \
    2>>"$LOG" || true
tail -50 /tmp/r4_trace/trace_sdxl_default.out | tee -a "$LOG"
echo "=== queue done $(date +%H:%M:%S) ===" | tee -a "$LOG"
