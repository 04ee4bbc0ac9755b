#!/bin/bash
cd /root/repo
while pgrep -f "queue_offline.sh" > /dev/null 2>&1; do sleep 30; done
timeout 7200 python benchmarks/family_evidence.py offline-prep >> /tmp/evidence_offline.log 2>&1
timeout 7200 python benchmarks/family_evidence.py offline-run >> /tmp/evidence_offline.log 2>&1
timeout 7200 python benchmarks/family_evidence.py goal --algo PPOLag --steps 30000000 --tag=-long >> /tmp/evidence_goal.log 2>&1
echo "OFFLINE2 DONE $(date)" >> /tmp/evidence_offline.log
