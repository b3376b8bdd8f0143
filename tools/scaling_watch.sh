#!/bin/bash
# Quiet-window watcher for the scaling-efficiency session (VERDICT r7 #1).
#
# Probes the host with bench.py's 10M-int scalar calibration loop every
# PROBE_INTERVAL seconds. When two consecutive probes read <= QUIET_SEC and
# no builder-side heavy job is running (marker file .heavy_running), fires
# one full N=1 vs 4N=4 scaling session (tools/bench_scaling.py, 37M turns)
# into a timestamped directory under BENCH/watch/ -- never clobbering the
# adjudicated BENCH/scaling.json. Stops after a session measures >= 0.8
# efficiency or after MAX_ATTEMPTS sessions.
set -u
REPO=/root/repo
LOG=$REPO/BENCH/scaling_watch.log
QUIET_SEC=0.60
PROBE_INTERVAL=${PROBE_INTERVAL:-900}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-4}
attempts=0

probe() {
  python3 -c "
import time
t0 = time.perf_counter()
s = 0
for i in range(10_000_000):
    s += i
print(round(time.perf_counter() - t0, 3))
"
}

log() { echo "$(date -u +%FT%TZ) $*" >> "$LOG"; }

log "watcher start (quiet<=${QUIET_SEC}s, interval=${PROBE_INTERVAL}s)"
while true; do
  c1=$(probe)
  log "probe calib=${c1}s"
  if [ -f "$REPO/BENCH/.scaling_met" ]; then log "met marker present; exit"; exit 0; fi
  # a .heavy_running older than 2h is a stale lock (round-8 post-mortem:
  # a launcher touched it and died, and every probe skipped for hours) —
  # ignore it with a log line instead of starving forever
  heavy=0
  if [ -f "$REPO/.heavy_running" ]; then
    if [ -n "$(find "$REPO/.heavy_running" -mmin -120 2>/dev/null)" ]; then
      heavy=1
    else
      log "stale .heavy_running (>2h old) — ignoring"
    fi
  fi
  if [ "$heavy" = 1 ]; then
    log "builder heavy job running; skip"
  elif python3 -c "import sys; sys.exit(0 if float('$c1') <= $QUIET_SEC else 1)"; then
    sleep 20
    c2=$(probe)
    log "confirm calib=${c2}s"
    if python3 -c "import sys; sys.exit(0 if float('$c2') <= $QUIET_SEC else 1)" \
       && [ ! -f "$REPO/.heavy_running" ]; then
      attempts=$((attempts + 1))
      out=$REPO/BENCH/watch/$(date -u +%Y%m%dT%H%M%S)
      mkdir -p "$out"
      echo "{\"calib_at_launch\": [$c1, $c2]}" > "$out/calib.json"
      log "QUIET window -> scaling session #$attempts -> $out"
      (cd "$REPO" && python3 tools/bench_scaling.py --convs 1500000 --extra-n 0 \
        --out "$out" >> "$out/stdout.log" 2>&1)
      eff=$(python3 -c "
import json
try:
    print(json.load(open('$out/scaling.json'))['scaling_efficiency'])
except Exception:
    print('nan')
")
      log "session #$attempts efficiency=$eff"
      if python3 -c "import sys; sys.exit(0 if float('$eff') >= 0.8 else 1)" 2>/dev/null; then
        touch "$REPO/BENCH/.scaling_met"
        log "TARGET MET ($eff >= 0.8); watcher exiting"
        exit 0
      fi
      if [ "$attempts" -ge "$MAX_ATTEMPTS" ]; then
        log "max attempts reached; watcher exiting"
        exit 0
      fi
    fi
  fi
  sleep "$PROBE_INTERVAL"
done
