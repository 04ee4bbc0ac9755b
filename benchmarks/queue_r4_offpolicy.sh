#!/bin/bash
# Round-4 off-policy parity queue: reference-faithful 1-env collection
# (VERDICT item 1 — the 16-env runs dug a deeper unconstrained excursion
# than the reference's single env, winding up lambda; with 1 env the
# lambda cadence, warm-up span, window, and per-transition ascent rate all
# match the reference protocol exactly at the published 1e6-transition
# budget).  One cell per algorithm first, then second seeds.
cd /root/repo
Q="/tmp/parity_r4_offpolicy.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 10800 python benchmarks/parity_run.py --off-policy --vector-env-nums 1 "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo SACLag --seed 0
run --algo DDPGLag --seed 0
run --algo TD3Lag --seed 0
run --algo SACLag --seed 5
run --algo DDPGLag --seed 5
run --algo TD3Lag --seed 5
echo "R4 OFF-POLICY QUEUE DONE $(date)" >> $Q
