#!/bin/bash
cd /root/repo
for algo in PPOLag PPO CPO; do
  timeout 7200 python benchmarks/family_evidence.py goal --algo $algo >> /tmp/evidence_goal.log 2>&1
done
echo "GOAL QUEUE DONE $(date)" >> /tmp/evidence_goal.log
