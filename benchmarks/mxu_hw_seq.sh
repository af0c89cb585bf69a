#!/bin/bash
# Phased MXU-kernel hardware validation (docs/TPU_TRAVERSAL.md "MXU
# cluster-leaf path"). Each phase is its own python process under
# `timeout`; the sequence aborts on first failure/hang so a wedged chip
# is never hit twice (wedge protocol: tiny compiled test first, one
# novel construct at a time).
#
# Run when the axon chip is healthy:  bash benchmarks/mxu_hw_seq.sh
# After phase 3 succeeds and numbers look right, flip MXU_LEAVES=True in
# kernels/traverse_pallas.py and rerun bench.py.
set -e
cd "$(dirname "$0")/.."
# repo root for mitsuba2_tpu imports, APPENDED to the existing path: the
# profile's PYTHONPATH carries the axon TPU plugin registration
# (/root/.axon_site) — replacing it silently downgrades jax to cpu/tpu
# backends and every phase dies at backend init.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${MXU_SEQ_LOG:-/tmp/mxu_hw_seq.log}
filter() { grep -v "xla_bridge\|cpu_aot" ; }

echo "=== $(date) phase 1: tiny compiled DMA+dot probe" | tee -a "$LOG"
timeout 420 python benchmarks/probe_mxu_dma.py 2>&1 | tail -4 | tee -a "$LOG"

echo "=== $(date) phase 2: tiny compiled MXU kernel (gallery subdiv=1, 4k rays)" | tee -a "$LOG"
timeout 600 python benchmarks/traverse_bench.py --backend mxu --n 4096 --subdiv 1 --rounds 2 --watchdog 540 2>&1 | filter | tee -a "$LOG"

echo "=== $(date) phase 2b: on-TPU MXU vs scalar correctness" | tee -a "$LOG"
timeout 600 python benchmarks/mxu_hw_check.py 2>&1 | filter | tee -a "$LOG"

echo "=== $(date) phase 3: full gallery (subdiv=4, 262k rays) mxu vs pallas" | tee -a "$LOG"
timeout 600 python benchmarks/traverse_bench.py --backend mxu --n 262144 --subdiv 4 --rounds 3 --watchdog 540 2>&1 | filter | tee -a "$LOG"
timeout 600 python benchmarks/traverse_bench.py --backend pallas --n 262144 --subdiv 4 --rounds 3 --watchdog 540 2>&1 | filter | tee -a "$LOG"

echo "=== $(date) phase 4: knob sweeps (block size, cluster size; walk_model.py predicts block=4096 + CK=128-256 best)" | tee -a "$LOG"
for e in "MI_MXU_BLOCK=2048" "MI_MXU_BLOCK=4096" "MI_CLUSTER_K=64" "MI_CLUSTER_K=256"; do
  echo "--- $e" | tee -a "$LOG"
  env $e timeout 600 python benchmarks/traverse_bench.py --backend mxu --n 262144 --subdiv 4 --rounds 3 --watchdog 540 2>&1 | filter | tee -a "$LOG"
done
echo "=== $(date) done" | tee -a "$LOG"

echo "=== $(date) phase 5: instanced kernels (shared-BLAS TLAS/BLAS walk)" | tee -a "$LOG"
timeout 600 python benchmarks/traverse_bench.py --backend inst --n 4096 --inst-n 4 --subdiv 2 --rounds 2 --watchdog 540 2>&1 | filter | tee -a "$LOG"
timeout 600 python benchmarks/traverse_bench.py --backend inst --n 262144 --inst-n 64 --subdiv 3 --rounds 3 --watchdog 540 2>&1 | filter | tee -a "$LOG"
# production arrangement (presort) + the flatten-to-MXU bake-off arm —
# decides the auto-backend policy for instanced scenes (VERDICT r03 #4)
timeout 600 python benchmarks/traverse_bench.py --backend inst --sort --n 262144 --inst-n 64 --subdiv 3 --rounds 3 --watchdog 540 2>&1 | filter | tee -a "$LOG"
timeout 900 python benchmarks/traverse_bench.py --backend instflat --sort --n 262144 --inst-n 64 --subdiv 3 --rounds 3 --watchdog 840 2>&1 | filter | tee -a "$LOG"
echo "=== $(date) all phases done" | tee -a "$LOG"

echo "=== $(date) phase 6: BVH8 child-testing walk (walk-model 6-7.4x fewer steps)" | tee -a "$LOG"
timeout 600 python benchmarks/traverse_bench.py --backend bvh8 --n 4096 --subdiv 1 --rounds 2 --watchdog 540 2>&1 | filter | tee -a "$LOG"
timeout 600 python benchmarks/traverse_bench.py --backend bvh8 --n 262144 --subdiv 4 --rounds 3 --watchdog 540 2>&1 | filter | tee -a "$LOG"
echo "=== $(date) phase 6 done" | tee -a "$LOG"
