#!/bin/bash
# Run the relay-blocked on-chip validation agenda in one shot (round 3).
# Each stage is timeout-bounded so a relay flap can't wedge the sequence;
# results accumulate in /tmp/onchip_agenda.log (and per-stage logs).
#
#   bash tools/onchip_agenda.sh
#
# Stages:
#   1. bench.py at current defaults (fused-crop per-frame grid)
#   2. FRAMES_PER_BATCH x VRL_CROP_FRAMES sweep (multi-frame crop unroll)
#   3. profile_step carl — per-op breakdown (conv1 stem fraction)
#   4. A/B: VRL_S2D_STEM=1 bench (exact space-to-depth stem reparam)
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/onchip_agenda.log
stamp() { echo "=== $1 $(date +%H:%M:%S) ===" | tee -a "$LOG"; }

stamp "bench (defaults)"
timeout 1800 python bench.py 2>/tmp/bench_default.err | tee -a "$LOG"

stamp "crop-frames A/B (both workloads via bench.py)"
for cf in 2 4 auto; do
  echo "--- VRL_CROP_FRAMES=$cf ---" | tee -a "$LOG"
  VRL_CROP_FRAMES=$cf timeout 1800 python bench.py \
    2>/tmp/bench_cf_$cf.err | tee -a "$LOG"
done

stamp "stem micro A/B (direct vs space-to-depth)"
timeout 1200 python tools/bench_stem.py 2>/tmp/bench_stem.err | tee -a "$LOG"

stamp "profile carl"
timeout 1800 python tools/profile_step.py carl 2>/tmp/prof_carl.err | tee -a "$LOG"

stamp "bench (VRL_S2D_STEM=1)"
VRL_S2D_STEM=1 timeout 1800 python bench.py 2>/tmp/bench_s2d.err | tee -a "$LOG"

stamp "bench (VRL_FUSED_VIT_BLOCK=1, reworked all-heads half-block)"
VRL_FUSED_VIT_BLOCK=1 timeout 1800 python bench.py 2>/tmp/bench_fvb.err | tee -a "$LOG"

stamp "bench (VRL_FUSED_MLP=1, fully fused LN2+fc1+GELU+fc2+residual)"
VRL_FUSED_MLP=1 timeout 1800 python bench.py 2>/tmp/bench_fmlp.err | tee -a "$LOG"

stamp "done"
