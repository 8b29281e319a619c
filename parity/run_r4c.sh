#!/bin/bash
# Round-4 parity campaign, phase C: remaining configs with tunnel-health
# gating and a heartbeat watchdog.
#
# The TPU tunnel occasionally wedges: the client blocks forever inside a
# device sync with no exception, so neither the in-process device-fault
# retry nor a plain `timeout` bound (short of its full 2.5 h) recovers.
# Every dispatch-level sync now touches $PPG_HEARTBEAT
# (ppg_tpu/utils/heartbeat.py); this driver kills an attempt whose
# heartbeat goes stale for >15 min (compiles are ~30-60 s; the longest
# legitimate silent stretch is a big-config remote compile) and retries
# after the tunnel answers a fresh-process probe again.
cd /root/repo
RES=parity/results_r4.jsonl
HB=/tmp/ppg_hb

tunnel_ok() {
  timeout 90 python -c "import jax; jax.devices(); import jax.numpy as j; \
(j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1
}

wait_tunnel() {
  for i in $(seq 1 40); do
    tunnel_ok && return 0
    echo "  tunnel down; probe $i/40 failed $(date +%T)"
    sleep 60
  done
  return 1
}

run() {
  local name="$1" spp="$2"
  if grep -q "\"scene\": \"$name\"" "$RES" 2>/dev/null; then
    echo "=== $name already done"; return 0
  fi
  for try in 1 2 3 4 5; do
    echo "=== $name (spp=${spp:-budget}) attempt $try $(date +%T)"
    wait_tunnel || { echo "=== tunnel never recovered"; return 1; }
    rm -f "$HB"; touch "$HB"
    PPG_HEARTBEAT=$HB timeout 13000 python -m ppg_tpu.tools.parity \
        --scene "$name" ${spp:+--spp $spp} --self-ratio \
        > /tmp/parity_one_r4c_$name.log 2>&1 &
    local pid=$!
    # watchdog: heartbeat stale >15 min => wedged, kill and retry
    while kill -0 $pid 2>/dev/null; do
      sleep 60
      local age=$(( $(date +%s) - $(stat -c %Y "$HB" 2>/dev/null || echo 0) ))
      if [ "$age" -gt 900 ]; then
        echo "  heartbeat stale ${age}s — killing wedged attempt $(date +%T)"
        kill $pid 2>/dev/null; sleep 5; kill -9 $pid 2>/dev/null
        break
      fi
    done
    wait $pid
    local rc=$?
    if [ $rc -eq 0 ] && grep -qE '^\{' /tmp/parity_one_r4c_$name.log; then
      grep -E '^\{' /tmp/parity_one_r4c_$name.log >> "$RES"
      echo "=== $name OK $(date +%T)"; return 0
    fi
    echo "=== $name attempt $try FAILED (rc=$rc)"
    tail -4 /tmp/parity_one_r4c_$name.log
    sleep 30
  done
  echo "=== $name GAVE UP"
  return 1
}

run cbox-improved ""
run spaceship ""
run spaceship-improved ""
run kitchen 256
run kitchen-improved 256
echo "=== phase C done ==="
cat "$RES"
