#!/bin/bash
# Round-3 parity queue (sequential; each cell is resumable/idempotent).
cd /root/repo
Q="/tmp/parity_queue.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 7200 python benchmarks/parity_run.py "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo CPPOPID --seed 0
run --algo TRPOLag --seed 5
run --algo CPPOPID --seed 5
run --algo TRPOLag --seed 10
run --algo CPPOPID --seed 10
run --algo CPO --seed 15
run --algo DDPGLag --seed 0 --off-policy
run --algo SACLag --seed 5 --off-policy
echo "QUEUE DONE $(date)" >> $Q
# appended: SACLag seed0 rerun with clip+window fixes (r3b)
