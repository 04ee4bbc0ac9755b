#!/bin/bash
# Round-4 Walker2d diagnosis lane (VERDICT item 2): the seed-0 TRPOLag cell
# (eval 2483.5 vs ref 3207.10±7.88) and the CPPOPID cell (877.5 vs ref band)
# are stuck in Walker2d's short-episode local optimum and end mid-takeoff.
# Evidence plan: seed spread (5, 10) + a seed-0 extension run (1.5e7 steps,
# resuming the 1e7 checkpoint) to show the climb completes.
# Waits for the FOCOPS resume (pid $1) to release its CPU lane first.
cd /root/repo
Q="/tmp/parity_r4_walker.log"
if [ -n "$1" ]; then tail --pid="$1" -f /dev/null; fi
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 10800 python benchmarks/parity_run.py "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo TRPOLag --seed 5 --env SafetyWalker2dVelocity-v1-mujoco
run --algo CPPOPID --seed 5 --env SafetyWalker2dVelocity-v1-mujoco
run --algo TRPOLag --seed 10 --env SafetyWalker2dVelocity-v1-mujoco
run --algo CPPOPID --seed 10 --env SafetyWalker2dVelocity-v1-mujoco
run --algo PPOLag --seed 10 --env SafetyWalker2dVelocity-v1-mujoco
echo "R4 WALKER QUEUE DONE $(date)" >> $Q
