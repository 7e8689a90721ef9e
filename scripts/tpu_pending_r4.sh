#!/bin/bash
# Pending TPU measurements queued when the tunnel died mid-round-4
# (STATUS.md "Pending on TPU availability").  Run on a live TPU:
#   bash scripts/tpu_pending_r4.sh
set -x
cd "$(dirname "$0")/.."

# 1. Whole-program A/B of the uint16 wide-row token view (committed with
#    byte-identical features; throughput delta unmeasured).
python scripts/e2e_throughput.py --out results/e2e_r4_u16widerow.json \
  --epochs 8 > /tmp/e2e_u16.log 2>&1

# 2. Fresh single-chip bench at HEAD.
python bench.py > /tmp/bench_head.json 2>/dev/null
cat /tmp/bench_head.json

# 3. E2E device trace confirming the residual sampling-op breakdown.
python scripts/profile_step.py --device_sampling --pool 2048 \
  --pool_stride 205 --steps 10 --outdir /tmp/trace_e2e \
  > /tmp/profile_e2e.log 2>&1
head -25 /tmp/profile_e2e.log

echo TPU-PENDING-R4-DONE
