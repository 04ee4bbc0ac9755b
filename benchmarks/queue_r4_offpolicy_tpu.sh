#!/bin/bash
# TPU lane: unconstrained off-policy cells at 16 envs (no lambda, so the
# 16-env excursion concern does not apply; published reference rows:
# DDPG 11377.10+-75.29, TD3 11246.12+-488.62, SAC 11488.86+-513.09 on
# SafetyHalfCheetahVelocity-v1, benchmarks/off-policy/README.md table 2).
# These validate the base off-policy learner end-to-end at the 11k band.
cd /root/repo
Q="/tmp/parity_r4_offpolicy_tpu.log"
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 10800 python benchmarks/parity_run.py --off-policy "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo SAC --seed 0
run --algo DDPG --seed 0
run --algo TD3 --seed 0
echo "R4 OFF-POLICY TPU QUEUE DONE $(date)" >> $Q
