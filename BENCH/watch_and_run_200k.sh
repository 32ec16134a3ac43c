#!/bin/bash
# Budget-watcher for the round-3 final 200k scaling attempt: idle-probe
# loop that fires the headline 200k 8->32 pair only when the aggregate-CPU
# probe (BENCH/cpu_control.py) shows the VM's burst budget recovered
# (32-vs-8 scaling >= THRESH).  Probes are ~2.5 s bursts, which the
# governor tolerates; the sustained pair is what it throttles, so waiting
# for a recovered probe is the only way to measure code scaling rather
# than the governor.  Writes scaling_200k_r3_final.json (never overwrites
# the earlier attempts, which stay as the throttle demonstration).
cd /root/repo
THRESH=${THRESH:-3.4}
MAX_WAIT_MIN=${MAX_WAIT_MIN:-75}
SLEEP_S=${SLEEP_S:-480}
LOG=BENCH/watch_200k_r3.log
: > "$LOG"
start=$(date +%s)
while :; do
  probe=$(python BENCH/cpu_control.py 1200)
  echo "$(date -u +%H:%M:%S) probe: $probe" >> "$LOG"
  s32=$(echo "$probe" | python -c 'import json,sys; print(json.load(sys.stdin)["agg_scaling_32_vs_8"])')
  ok=$(python -c "print(1 if $s32 >= $THRESH else 0)")
  now=$(date +%s); mins=$(( (now - start) / 60 ))
  if [ "$ok" = "1" ]; then
    echo "$(date -u +%H:%M:%S) budget recovered (32v8=$s32 >= $THRESH) after ${mins}m — running 200k pair" >> "$LOG"
    echo "agg_control_pre: $probe" >> "$LOG"
    SCALING_OUT=scaling_200k_r3_final.json python BENCH/scaling.py 200000 2 >> "$LOG" 2>&1
    echo "agg_control_post: $(python BENCH/cpu_control.py 1200)" >> "$LOG"
    echo "WATCH_RUN_DONE" >> "$LOG"
    exit 0
  fi
  if [ "$mins" -ge "$MAX_WAIT_MIN" ]; then
    echo "$(date -u +%H:%M:%S) gave up after ${mins}m (last 32v8=$s32) — budget never recovered; earlier artifacts stand" >> "$LOG"
    echo "WATCH_TIMED_OUT" >> "$LOG"
    exit 1
  fi
  sleep "$SLEEP_S"
done
