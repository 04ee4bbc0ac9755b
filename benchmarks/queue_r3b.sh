#!/bin/bash
# waits for queue_r3.sh to finish, then runs the off-policy reruns
cd /root/repo
Q="/tmp/parity_queue.log"
while pgrep -f "queue_r3.sh" > /dev/null 2>&1; do sleep 60; done
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 7200 python benchmarks/parity_run.py "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo SACLag --seed 0 --off-policy
echo "QUEUE R3B DONE $(date)" >> $Q
