#!/bin/bash
# tail queue: cells that can finish now or resume cleanly next round
cd /root/repo
Q="/tmp/parity_breadth.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 7200 python benchmarks/parity_run.py "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo TRPOLag --seed 0 --env SafetyWalker2dVelocity-v1-mujoco
run --algo CPPOPID --seed 0 --env SafetyWalker2dVelocity-v1-mujoco
run --algo FOCOPS --seed 10
run --algo PPOLag --seed 10 --env SafetyWalker2dVelocity-v1-mujoco
echo "TAIL QUEUE DONE $(date)" >> $Q
