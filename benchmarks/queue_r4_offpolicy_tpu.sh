#!/bin/bash
# Consolidated off-policy TPU lane (serialized — one TPU client at a time).
# 1-env Lagrangian cells use the CPU-actor/TPU-learner epoch with
# 50-transition cycles (one tunnel round trip per cycle, not per step);
# 16-env unconstrained cells validate the base learner at the ~11k band
# (reference rows: DDPG 11377.10±75.29, TD3 11246.12±488.62,
# SAC 11488.86±513.09, benchmarks/off-policy/README.md table 2).
cd /root/repo
Q="/tmp/parity_r4_offpolicy.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 10800 python benchmarks/parity_run.py --off-policy "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo SACLag --seed 0 --vector-env-nums 1
run --algo DDPGLag --seed 0 --vector-env-nums 1
run --algo TD3Lag --seed 0 --vector-env-nums 1
run --algo SAC --seed 0
run --algo SACLag --seed 5 --vector-env-nums 1
run --algo DDPGLag --seed 5 --vector-env-nums 1
run --algo TD3Lag --seed 5 --vector-env-nums 1
run --algo DDPG --seed 0
run --algo TD3 --seed 0
echo "R4 OFF-POLICY TPU QUEUE DONE $(date)" >> $Q
