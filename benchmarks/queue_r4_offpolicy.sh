#!/bin/bash
# Round-4 off-policy parity queue, two lanes:
#   CPU lane (this script): reference-faithful 1-env Lagrangian cells —
#     at 1 env each 5-transition cycle is its own dispatch, so the tunnel
#     RTT made the TPU path 10x slower than local CPU here (measured
#     24.9 s/epoch vs ~2-5 s); the cells resume from any checkpoints the
#     aborted TPU attempt wrote.
#   TPU lane (queue_r4_offpolicy_tpu.sh): 16-env unconstrained cells.
cd /root/repo
Q="/tmp/parity_r4_offpolicy.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 14400 python benchmarks/parity_run.py --off-policy --cpu --vector-env-nums 1 "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo SACLag --seed 0
run --algo DDPGLag --seed 0
run --algo TD3Lag --seed 0
run --algo SACLag --seed 5
run --algo DDPGLag --seed 5
run --algo TD3Lag --seed 5
echo "R4 OFF-POLICY CPU QUEUE DONE $(date)" >> $Q
