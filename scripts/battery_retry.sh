#!/bin/bash
# Retry wrapper for the one-claim TPU battery: the axon tunnel serializes
# claims and a wedged waiter blocks them for ~25 min, so exp runs exit 9
# when no chip arrives within the watchdog budget. Retry on exit 9 only.
# Usage: battery_retry.sh <logfile> [exp ...]
log="$1"; shift
for attempt in $(seq 1 40); do
  echo "# attempt $attempt $(date -u +%H:%M:%S)" >> "$log"
  python "$(dirname "$0")/tpu_battery_r3.py" "$@" >> "$log" 2>&1
  rc=$?
  if [ "$rc" -ne 9 ]; then
    echo "# battery finished rc=$rc" >> "$log"
    exit "$rc"
  fi
  sleep 90
done
echo "# battery gave up after 40 attempts" >> "$log"
exit 9
