#!/bin/bash
# Round-5 off-policy queue A: SACLag seed 0 then TD3Lag seed 0, fresh
# single-shot 1-env cells under the per-iteration λ cadence fix
# (lambda_lr 1e-5, one λ Adam step per update iteration — reference-exact).
cd /root/repo
Q="/tmp/parity_r5_offpolicy_a.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 14400 python benchmarks/parity_run.py --off-policy --vector-env-nums 1 "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo SACLag --seed 0
run --algo TD3Lag --seed 0
echo "R5 OFFPOLICY QUEUE A DONE $(date)" >> $Q
