#!/bin/bash
# Pending TPU measurements for round 5 (the tunnel has been dead since
# mid-round-4; a probe loop watches for it).  Run on a live TPU:
#   bash scripts/tpu_pending_r5.sh
# Ordered cheapest-first so a flaky tunnel still yields the top items.
set -x
cd "$(dirname "$0")/.."

# 1. Fresh single-chip bench at HEAD (BENCH_r05 must be non-null).
timeout 1800 python bench.py | tee /tmp/bench_head_r5.json

# 2. Whole-program A/B of the uint16 wide-row token view (committed in
#    round 4 with byte-identical features; throughput delta unmeasured).
timeout 3600 python scripts/e2e_throughput.py \
  --out results/e2e_r5_u16widerow.json --epochs 8 \
  > /tmp/e2e_u16_r5.log 2>&1
tail -3 /tmp/e2e_u16_r5.log

# 3. E2E device trace confirming the residual sampling-op breakdown
#    (wide-row gather / doc-meta gather / perm slice itemization at HEAD).
timeout 3600 python scripts/profile_step.py --device_sampling --pool 2048 \
  --pool_stride 205 --steps 10 --outdir /tmp/trace_e2e_r5 \
  > /tmp/profile_e2e_r5.log 2>&1
head -25 /tmp/profile_e2e_r5.log

# 4. Dispatch amortization at larger steps_per_call (the remaining
#    itemized E2E gap is partly per-call dispatch; VERDICT r4 #3).
timeout 3600 python scripts/e2e_throughput.py \
  --out results/e2e_r5_k56.json --epochs 8 --steps_per_call 56 \
  > /tmp/e2e_k56_r5.log 2>&1
tail -3 /tmp/e2e_k56_r5.log

# 5. Mid-scale pool-coverage quality point (VERDICT r4 weak #5): 16384
#    docs puts a P=2048 pool at 12.5% coverage, between the measured
#    3-20% (pooled wins) and >=100% (pooled loses) points.  Skipped when
#    the CPU fallback run (quality is platform-independent) has already
#    produced the rows — it takes ~4 h on the single host core, so it
#    runs there whenever the tunnel is down.
if [ "$(wc -l < results/collection_scale_r5_16k.jsonl 2>/dev/null)" -lt 10 ]; then
  timeout 14400 python scripts/collection_scale_study.py \
    --out results/collection_scale_r5_16k.jsonl --num_docs 16384 \
    --config perinst --seeds 1,2,3,4,5 > /tmp/cs16k_a.log 2>&1
  timeout 14400 python scripts/collection_scale_study.py \
    --out results/collection_scale_r5_16k.jsonl --num_docs 16384 \
    --config pool2048_s205 --seeds 1,2,3,4,5 > /tmp/cs16k_b.log 2>&1
fi
tail -2 results/collection_scale_r5_16k.jsonl

echo TPU-PENDING-R5-DONE
