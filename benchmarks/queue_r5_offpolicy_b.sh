#!/bin/bash
# Round-5 off-policy queue B: DDPGLag seed 0 then SACLag seed 5, fresh
# single-shot 1-env cells under the per-iteration λ cadence fix.
cd /root/repo
Q="/tmp/parity_r5_offpolicy_b.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 14400 python benchmarks/parity_run.py --off-policy --vector-env-nums 1 "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo DDPGLag --seed 0
run --algo SACLag --seed 5
echo "R5 OFFPOLICY QUEUE B DONE $(date)" >> $Q
