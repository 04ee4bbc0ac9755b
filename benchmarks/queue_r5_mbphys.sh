#!/bin/bash
# Round-5 model-based real-physics queue (VERDICT item 5): full-budget
# PETS / CCEPETS / SafeLOOP on physics-exact HalfCheetah velocity with the
# reference-scale planner resident on the TPU.
cd /root/repo
Q="/tmp/mbphys_r5.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 10800 python benchmarks/family_evidence.py modelbased-physics --tpu --planner reference --tag full "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo PETS --steps 400000
run --algo CCEPETS --steps 400000
run --algo SafeLOOP --steps 400000
echo "R5 MBPHYS QUEUE DONE $(date)" >> $Q
