#!/bin/bash
# Round-5 TPU experiment queue: runs bm_round5.py experiments sequentially.
# Each experiment appends a row to bm_results_round5.csv on success; the PoE
# stages checkpoint to /tmp so a crashed run resumes where it left off.
cd /root/repo
for exp in "$@"; do
  echo "=== QUEUE: $exp ($(date -u +%H:%M:%S)) ===" >> /tmp/r5_queue.log
  timeout 7200 python -u scripts/bm_round5.py "$exp" >> /tmp/r5_queue.log 2>&1
  echo "=== DONE: $exp rc=$? ($(date -u +%H:%M:%S)) ===" >> /tmp/r5_queue.log
done
echo "=== QUEUE COMPLETE ===" >> /tmp/r5_queue.log
