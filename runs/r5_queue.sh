#!/bin/bash
# Serial job queue for round 5 long runs (4-core host: NEVER run two
# heavy jobs concurrently — round-3's h1024 round-wall drift was load
# contention).  Each non-comment line of runs/r5_queue.txt is a shell
# command; lines may be appended/edited while the queue runs (the file
# is re-read before every job).  Logs -> runs/logs/r5_job_<i>.log
cd /root/repo
# `python benchmarks/foo.py` puts benchmarks/ (not the repo root) on
# sys.path — every bare-script job needs the root importable.  The
# axon site dir must STAY on the path or the TPU plugin vanishes
# (verify skill: clobbering PYTHONPATH breaks the plugin).
export PYTHONPATH=/root/.axon_site:/root/repo
Q=runs/r5_queue.txt
i=0
while true; do
  line=$(grep -v '^\s*#' "$Q" | sed -n "$((i+1))p")
  if [ -z "$line" ]; then
    # queue drained; poll briefly in case more jobs get appended
    sleep 60
    line=$(grep -v '^\s*#' "$Q" | sed -n "$((i+1))p")
    [ -z "$line" ] && break
  fi
  echo "=== JOB $i START $(date -u +%H:%M:%S): $line" | tee -a runs/logs/r5_queue.log
  eval "$line" > "runs/logs/r5_job_$i.log" 2>&1
  echo "=== JOB $i DONE rc=$? $(date -u +%H:%M:%S)" | tee -a runs/logs/r5_queue.log
  i=$((i+1))
done
echo "=== QUEUE DRAINED $(date -u +%H:%M:%S)" | tee -a runs/logs/r5_queue.log
