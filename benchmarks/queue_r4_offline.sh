#!/bin/bash
# Round-4 offline breadth (VERDICT item 4): run the remaining five offline
# algorithms through the analytic-Circle mixed-dataset beta protocol that
# COptiDICE already has, mirroring the reference's offline tables
# (reference: benchmarks/offline/README.md:117-222).
# Waits for pid $1 (the Walker2d PPOLag tail cell) to release a CPU lane.
cd /root/repo
Q="/tmp/evidence_r4_offline.log"
if [ -n "$1" ]; then tail --pid="$1" -f /dev/null; fi
run() { echo "=== $(date +%H:%M:%S) $*" >> $Q; timeout 7200 python benchmarks/family_evidence.py offline-run "$@" >> $Q 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" >> $Q; }
run --algo VAEBC
run --algo BCQ
run --algo BCQLag
run --algo CRR
run --algo CCRR
echo "R4 OFFLINE QUEUE DONE $(date)" >> $Q
