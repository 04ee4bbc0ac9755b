#!/bin/bash
# Round-5 on-policy queue: the four remaining published families
# (EarlyTerminated rerun after the host-path fix; PG/NPG unconstrained).
cd /root/repo
Q="/tmp/parity_r5_onpolicy.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 7200 python benchmarks/parity_run.py "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo PPOEarlyTerminated --seed 0
run --algo TRPOEarlyTerminated --seed 0
run --algo PolicyGradient --seed 0
run --algo NaturalPG --seed 0
echo "R5 ON-POLICY QUEUE DONE $(date)" >> $Q
