#!/bin/bash
# Round-5 off-policy queue C (chained after queue A): unconstrained base
# learners at the published protocol (VERDICT item 3 — bisects lambda
# dynamics from base-learner parity; bands already in report_breadth.py).
cd /root/repo
if [ -n "$1" ]; then tail --pid="$1" -f /dev/null; fi
Q="/tmp/parity_r5_offpolicy_c.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 14400 python benchmarks/parity_run.py --off-policy --vector-env-nums 1 "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo SAC --seed 0
run --algo DDPG --seed 0
run --algo TD3 --seed 0
echo "R5 OFFPOLICY QUEUE C DONE $(date)" >> $Q
