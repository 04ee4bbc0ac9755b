#!/bin/bash
# Round-5 serialized TPU queue: waits for the off-policy Lag queues (A and
# B) to release the chip, then runs the model-based physics evidence
# (VERDICT item 5) and finally the unconstrained off-policy cells (item 3).
# A third concurrent TPU client starves behind the Lag learners' dispatch
# streams (observed: 22 min without compiling), so TPU users run serially.
cd /root/repo
for pid in "$@"; do tail --pid="$pid" -f /dev/null; done
Q="/tmp/mbphys_r5.log"
runmb() { echo "=== $(date +%H:%M:%S) mbphys $*" >> $Q; timeout 7200 python benchmarks/family_evidence.py modelbased-physics --tpu --planner reference --tag full "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
runmb --algo PETS --steps 200000
runmb --algo CCEPETS --steps 200000
runmb --algo SafeLOOP --steps 200000
echo "R5 MBPHYS DONE $(date)" >> $Q
P="/tmp/parity_r5_offpolicy_c.log"
runc() { echo "=== $(date +%H:%M:%S) $*" >> $P; timeout 14400 python benchmarks/parity_run.py --off-policy --vector-env-nums 1 "$@" >> $P 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $P; }
runc --algo SAC --seed 0
runc --algo DDPG --seed 0
runc --algo TD3 --seed 0
echo "R5 SERIAL TPU QUEUE DONE $(date)" >> $P
