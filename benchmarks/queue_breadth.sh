#!/bin/bash
# env/algorithm breadth cells (CPU-bound; runs alongside the TPU-bound off-policy queue)
cd /root/repo
Q="/tmp/parity_breadth.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 7200 python benchmarks/parity_run.py "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo PPOLag --seed 0 --env SafetyWalker2dVelocity-v1-mujoco
run --algo CPO --seed 0 --env SafetyWalker2dVelocity-v1-mujoco
run --algo FOCOPS --seed 0
run --algo PPOLag --seed 5 --env SafetyWalker2dVelocity-v1-mujoco
run --algo CPO --seed 5 --env SafetyWalker2dVelocity-v1-mujoco
run --algo FOCOPS --seed 5
echo "BREADTH QUEUE DONE $(date)" >> $Q
