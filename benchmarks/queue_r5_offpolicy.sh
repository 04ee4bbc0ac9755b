#!/bin/bash
# Round-5 off-policy queue: fresh single-shot 1-env cells (no mid-run
# resumes — each resume wipes the replay ring, which taints the trajectory).
cd /root/repo
Q="/tmp/parity_r5_offpolicy.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 10800 python benchmarks/parity_run.py --off-policy --vector-env-nums 1 "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo TD3Lag --seed 0
run --algo SACLag --seed 5
run --algo DDPGLag --seed 5
