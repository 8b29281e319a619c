#!/bin/bash
# Round-5 parity campaign (VERDICT r4 item 1 — the round's definition of
# done): drive ALL remaining configs to committed rows in
# parity/results_r5.jsonl, passing or not. Tunnel-health gating + the
# heartbeat watchdog from run_r4c.sh (the TPU tunnel occasionally wedges
# inside a device sync with no exception; every dispatch-level sync
# touches $PPG_HEARTBEAT, and an attempt whose heartbeat goes stale
# >15 min is killed and retried once the tunnel answers a fresh-process
# probe).
#
# Row order: fastest-first so a bad tunnel day still lands the most
# decisive rows (cbox-improved = the 1.246-gate re-measurement, then
# spaceship, then the kitchen pair at the reduced 256-spp protocol).
cd /root/repo
RES=parity/results_r5.jsonl
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
    PPG_HEARTBEAT=$HB timeout 20000 python -m ppg_tpu.tools.parity \
        --scene "$name" ${spp:+--spp $spp} --self-ratio \
        > /tmp/parity_one_r5_$name.log 2>&1 &
    local pid=$!
    while kill -0 $pid 2>/dev/null; do
      sleep 60
      local age=$(( $(date +%s) - $(stat -c %Y "$HB" 2>/dev/null || echo 0) ))
      # compile progress counts as liveness: big-config programs compile
      # server-side for many minutes with no dispatch syncs (and thus no
      # heartbeats), but each finished program lands in the persistent
      # compilation cache — r4's campaign (and early r5) killed
      # legitimate compile sessions as "wedged"
      local newest=$(ls -t /root/.cache/ppg_tpu_xla 2>/dev/null | head -1)
      if [ -n "$newest" ]; then
        local cage=$(( $(date +%s) - $(stat -c %Y \
            "/root/.cache/ppg_tpu_xla/$newest") ))
        [ "$cage" -lt "$age" ] && age=$cage
      fi
      if [ "$age" -gt 1200 ]; then
        echo "  liveness stale ${age}s — killing wedged attempt $(date +%T)"
        kill $pid 2>/dev/null; sleep 5; kill -9 $pid 2>/dev/null
        break
      fi
    done
    wait $pid
    local rc=$?
    if [ $rc -eq 0 ] && grep -qE '^\{' /tmp/parity_one_r5_$name.log; then
      grep -E '^\{' /tmp/parity_one_r5_$name.log >> "$RES"
      echo "=== $name OK $(date +%T)"; return 0
    fi
    echo "=== $name attempt $try FAILED (rc=$rc)"
    tail -4 /tmp/parity_one_r5_$name.log
    sleep 30
  done
  echo "=== $name GAVE UP"
  return 1
}

# cbox row carries over only if re-measured this round; run it too (fast)
run cbox-improved ""
run cbox ""
run spaceship ""
run spaceship-improved ""
run kitchen 256
run kitchen-improved 256
echo "=== r5 campaign done ==="
cat "$RES"
