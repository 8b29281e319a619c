#!/bin/bash
# Round-4 parity campaign, phase B: cbox-improved re-run with the
# reference-cadence kl Adam (commit 67cd6d0) + both spaceship configs.
cd /root/repo
RES=parity/results_r4.jsonl
run() {
  local name="$1"
  if grep -q "\"scene\": \"$name\"" "$RES" 2>/dev/null; then
    echo "=== $name already done"; return 0
  fi
  for try in 1 2 3; do
    echo "=== $name (spp=${2:-budget}) attempt $try $(date +%T)"
    if timeout 9000 python -m ppg_tpu.tools.parity --scene "$name" \
        ${2:+--spp $2} --self-ratio > /tmp/parity_one_r4b_$name.log 2>&1; then
      grep -E '^\{' /tmp/parity_one_r4b_$name.log >> "$RES"
      echo "=== $name OK"; return 0
    fi
    echo "=== $name attempt $try FAILED (rc=$?)"
    tail -3 /tmp/parity_one_r4b_$name.log
    sleep 30
  done
  echo "=== $name GAVE UP"
  return 1
}
run cbox-improved ""
run spaceship ""
run spaceship-improved ""
echo "=== phase B done ==="
