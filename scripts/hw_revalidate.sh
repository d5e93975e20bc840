#!/bin/bash
# Round-4 hardware revalidation queue (VERDICT r3 next-steps #1).
#
# Runs every queued TPU job SERIALIZED (two concurrent TPU processes corrupt
# timings through the tunnel) with nohup-safe logging.  Start it once the
# tunnel probe reports TPU_OK:
#
#   nohup bash scripts/hw_revalidate.sh > /tmp/hw_reval.log 2>&1 &
#
# Then poll /tmp/hw_reval.log.  Each stage appends a section marker so a
# wedged stage is identifiable; a stage failure does not stop the queue
# (the tunnel flakes — rerun failed stages individually).

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

stage() {
  echo ""
  echo "===== [$(date +%H:%M:%S)] $1 ====="
}

stage "0. sanity: jax.devices()"
python /tmp/tpu_probe.py 2>&1 | tail -1

stage "1. eval bench (HEAD, bf16 batch 256) — target >= 6187"
python bench.py || true

stage "2. train bench fp32 batch 60"
BENCH_MODE=train BENCH_DTYPE=float32 python bench.py || true

stage "3. train bench bf16 batch 60"
BENCH_MODE=train BENCH_DTYPE=bfloat16 python bench.py || true

stage "4. hardware grad check fp32 (fused vs unfused, post-kernel-changes)"
CHECK_DTYPE=float32 python scripts/check_grads_hw.py || true

stage "5. hardware grad check bf16 (incl. the outage-queued bwd-kernel case)"
CHECK_DTYPE=bfloat16 python scripts/check_grads_hw.py || true

stage "6. shard_map x Mosaic single-chip compile+run (no all-gather)"
python scripts/check_meshcompile_hw.py || true

stage "7. A/B: head-packed ViT attention (RELPOSE_VIT_PACK_HEADS=1)"
RELPOSE_VIT_PACK_HEADS=1 python bench.py || true

stage "8. A/B: essential-kernel bf16 MXU normalizers (RELPOSE_EB_MXU_NORM=1)"
RELPOSE_EB_MXU_NORM=1 python bench.py || true

stage "8b. A/B: channels-first ViT ingest (RELPOSE_VIT_CF=1)"
RELPOSE_VIT_CF=1 python bench.py || true

stage "8c. A/B: LN-fused essential pair kernel is the new default — its OFF lever"
RELPOSE_EB_NO_PAIR=1 python bench.py || true

stage "9. A/B: conv layout probe (queued from round 3)"
python scripts/bench_convlayout.py || true

stage "10. A/B: s2d stem from 384x512 source (queued from round 3)"
SRC_H=384 SRC_W=512 python scripts/bench_stem.py || true

stage "DONE"
