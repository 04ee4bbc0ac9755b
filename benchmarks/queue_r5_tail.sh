#!/bin/bash
# Round-5 tail queue: waits for the r5 on-policy queue, then runs the
# Walker2d coverage cells (VERDICT items 4/6/8), the 5th CPO HalfCheetah
# seed (item 9), and the CCRR beta=0.5 seed-1 rerun (item 7).
cd /root/repo
Q="/tmp/parity_r5_tail.log"
if [ -n "$1" ]; then tail --pid="$1" -f /dev/null; fi
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 7200 python benchmarks/parity_run.py "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo CPPOPID --env SafetyWalker2dVelocity-v1-mujoco --seed 15
run --algo TRPOLag --env SafetyWalker2dVelocity-v1-mujoco --seed 15
run --algo FOCOPS --env SafetyWalker2dVelocity-v1-mujoco --seed 0
run --algo CUP --env SafetyWalker2dVelocity-v1-mujoco --seed 0
run --algo PPOSaute --env SafetyWalker2dVelocity-v1-mujoco --seed 0
run --algo CPO --seed 20
echo "=== $(date +%H:%M:%S) CCRR seed-1 rerun" >> $Q
timeout 7200 python benchmarks/family_evidence.py offline-one --algo CCRR --beta 0.5 --seed 1 >> $Q 2>&1
echo "--- rc=$? $(date +%H:%M:%S)" >> $Q
echo "R5 TAIL QUEUE DONE $(date)" >> $Q
