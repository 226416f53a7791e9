#!/bin/bash
# Serial job queue, round-5 third flight (see r5_queue.sh for the
# rationale: 4-core host, one heavy job at a time; axon site dir must
# stay on PYTHONPATH or the TPU plugin vanishes).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p runs/logs
Q=runs/r5b_queue.txt
i=0
while true; do
  line=$(grep -v '^\s*#' "$Q" | sed -n "$((i+1))p")
  if [ -z "$line" ]; then
    sleep 60
    line=$(grep -v '^\s*#' "$Q" | sed -n "$((i+1))p")
    [ -z "$line" ] && break
  fi
  echo "=== JOB $i START $(date -u +%H:%M:%S): $line" | tee -a runs/logs/r5b_queue.log
  eval "$line" > "runs/logs/r5b_job_$i.log" 2>&1
  echo "=== JOB $i DONE rc=$? $(date -u +%H:%M:%S)" | tee -a runs/logs/r5b_queue.log
  i=$((i+1))
done
echo "=== QUEUE DRAINED $(date -u +%H:%M:%S)" | tee -a runs/logs/r5b_queue.log
