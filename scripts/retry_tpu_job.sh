#!/bin/bash
# Retry harness for the flaky tunnel: launch the given command; if it
# fails to attach to the device (process CPU time frozen below a floor
# after a grace period), kill it and retry.  Once attached, a job holds
# its connection for the whole run, so retrying the CONNECT is the only
# part that needs the loop.
#
# Usage: retry_tpu_job.sh <logfile> <command...>
set -u
LOG="$1"; shift
ATTACH_GRACE=${ATTACH_GRACE:-240}   # seconds before the first liveness check
CPU_FLOOR=${CPU_FLOOR:-45}          # attached processes burn >45s CPU compiling
MAX_TRIES=${MAX_TRIES:-40}

cpu_secs() {  # total CPU seconds of pid $1 (utime+stime, clock ticks)
  local stat
  stat=$(cut -d' ' -f14,15 "/proc/$1/stat" 2>/dev/null) || { echo 0; return; }
  echo $(( ($(echo "$stat" | cut -d' ' -f1) + $(echo "$stat" | cut -d' ' -f2))
           / $(getconf CLK_TCK) ))
}

for try in $(seq 1 "$MAX_TRIES"); do
  echo "=== try $try $(date) ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  pid=$!
  sleep "$ATTACH_GRACE"
  if ! kill -0 "$pid" 2>/dev/null; then
    wait "$pid"; rc=$?
    echo "=== finished fast rc=$rc $(date) ===" >> "$LOG"
    [ $rc -eq 0 ] && exit 0
    sleep 15; continue
  fi
  cpu=$(cpu_secs "$pid")
  if [ "$cpu" -lt "$CPU_FLOOR" ]; then
    # double-check: some jobs attach late; give one more grace period
    sleep 120
    cpu2=$(cpu_secs "$pid")
    if [ $((cpu2 - cpu)) -lt 10 ]; then
      echo "=== try $try stalled at connect (cpu=$cpu2); retrying $(date) ===" >> "$LOG"
      kill "$pid" 2>/dev/null; sleep 3; kill -9 "$pid" 2>/dev/null
      sleep 10; continue
    fi
  fi
  echo "=== try $try attached (cpu=$cpu); waiting $(date) ===" >> "$LOG"
  wait "$pid"; rc=$?
  echo "=== job rc=$rc $(date) ===" >> "$LOG"
  exit $rc
done
echo "=== gave up after $MAX_TRIES tries $(date) ===" >> "$LOG"
exit 1
