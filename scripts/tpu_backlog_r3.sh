#!/bin/bash
# Round-3 TPU measurement backlog — run once the axon tunnel is back.
# One job at a time (tpu-session-discipline); each stage logs to /tmp.
set -x
cd /root/repo

# 0. chain-fusion chip gate (Mosaic lowering of the conv prologue/emit/epi
#    arms and the stats-external IN apply — interpret-mode is proven; this
#    is the hardware validation the VANGAN_FUSE_PREACT flag is waiting on)
VANGAN_TPU_TESTS=1 JAX_PLATFORMS= timeout 2400 python -m pytest \
    tests/test_pallas_tpu.py -k FusedPreact -q > /tmp/r3_fp_gate.log 2>&1

# 1. fused-chain block timings + per-launch fixed cost (ROADMAP P0.3)
timeout 1800 python scripts/microbench_conv.py --fp > /tmp/r3_fp_micro.log 2>&1
timeout 1800 python scripts/microbench_conv.py --dual > /tmp/r3_dual_micro.log 2>&1
timeout 1200 python scripts/microbench_conv.py --launch > /tmp/r3_launch.log 2>&1

# 2. step-level A/B of the chain (full bench also probes these; this gives
#    the fast single-metric diagnostic first)
timeout 3600 python bench.py --batch 1 > /tmp/r3_fp_off.log 2>&1
VANGAN_FUSE_PREACT=1 timeout 3600 python bench.py --batch 1 > /tmp/r3_fp_on.log 2>&1
# fused batch 3 without remat: the chain halves the residual set
VANGAN_FUSE_PREACT=1 VANGAN_BENCH_REMAT=0 timeout 3600 python bench.py --batch 3 \
    > /tmp/r3_fp_b3.log 2>&1

# 3. IN kernel timing with parallel grid semantics (one-line lever)
timeout 1200 python scripts/microbench_conv.py --norm > /tmp/r3_norm_parallel.log 2>&1

# 4. enc1 stride-2 bwd bisection
timeout 1200 python scripts/microbench_conv.py > /tmp/r3_conv_base.log 2>&1
VANGAN_CONV_STACK=0 timeout 1200 python scripts/microbench_conv.py > /tmp/r3_conv_nostack.log 2>&1
VANGAN_CONV_DB=0 timeout 1200 python scripts/microbench_conv.py > /tmp/r3_conv_nodb.log 2>&1

# 5. banded-stitcher inference number
timeout 2400 python bench.py --inference > /tmp/r3_inference.log 2>&1

# 6. accuracy regeneration (VERDICT item 8; ~40 min)
timeout 5400 python examples/train_synthetic.py --preset results \
    --out /tmp/vg_results_r3 > /tmp/r3_results.log 2>&1

# 7. monolithic backward retry at batch 3 (the chain + flattened optimizer
#    shrink the module — the compile-helper OOM may be gone)
VANGAN_FUSE_PREACT=1 VANGAN_BENCH_MODE=two_phase VANGAN_BENCH_REMAT=0 \
    timeout 3600 python bench.py --batch 3 > /tmp/r3_fp_b3_mono.log 2>&1

# 8. inference A/B with the chain (generator fwd-only — the chain deletes
#    ~2/3 of the fwd launches)
VANGAN_FUSE_PREACT=1 timeout 2400 python bench.py --inference > /tmp/r3_fp_inf.log 2>&1

# 9. full bench re-record (selftest + batch 1/3 incl. fused probes + inference)
python bench.py > /tmp/r3_bench_final.log 2>&1

echo "BACKLOG DONE rc=$?"

# NOTE: if stage 0 fails ONLY on the emit/epi/oact arms (chain epilogues),
# retry the step A/B with the prologue-only degradation:
#   VANGAN_FUSE_PREACT=pro python bench.py --batch 1
# If only the DUAL block-entry kernel fails (conv3d dual arm), disable it
# alone and keep the rest of the chain:
#   VANGAN_FUSE_PREACT=1 VANGAN_FUSE_DUAL=0 python bench.py --batch 1
