#!/bin/bash
# Round-4 on-policy queue: resume FOCOPS seed 10, then the breadth sweep
# (VERDICT round-3 item 3 — every published on-policy family on
# physics-exact HalfCheetah, 1 seed each, reference protocol 1e7 steps).
# Ordered so the most-cited constrained families land first if the round
# ends before the queue drains; each cell is idempotent/resumable.
cd /root/repo
Q="/tmp/parity_r4_onpolicy.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 7200 python benchmarks/parity_run.py "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo FOCOPS --seed 10
run --algo PPO --seed 0
run --algo TRPO --seed 0
run --algo PDO --seed 0
run --algo RCPO --seed 0
run --algo P3O --seed 0
run --algo CUP --seed 0
run --algo PCPO --seed 0
run --algo TRPOPID --seed 0
run --algo OnCRPO --seed 0
run --algo IPO --seed 0
run --algo PPOSaute --seed 0
run --algo TRPOSaute --seed 0
run --algo PPOSimmerPID --seed 0
run --algo TRPOSimmerPID --seed 0
run --algo PPOEarlyTerminated --seed 0
run --algo TRPOEarlyTerminated --seed 0
run --algo PolicyGradient --seed 0
run --algo NaturalPG --seed 0
echo "R4 ON-POLICY QUEUE DONE $(date)" >> $Q
