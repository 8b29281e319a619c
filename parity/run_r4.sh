#!/bin/bash
# Round-4 parity campaign: all six scene configs (VERDICT item 1).
# Each config runs in a fresh process and retries on TPU-tunnel crashes
# (GTs are cached on disk so retries are cheap). Results append to
# parity/results_r4.jsonl. Kitchen runs at a reduced 256-spp equal-spp
# budget (self-ratio protocol: guided must beat our own unguided at the
# same spp; the bundled EXR is not comparable anyway - 6 occluder
# meshes missing from the mounted reference copy).
cd /root/repo
mkdir -p parity
RES=parity/results_r4.jsonl
run() {
  local name="$1"
  if grep -q "\"scene\": \"$name\"" "$RES" 2>/dev/null; then
    echo "=== $name already done"; return 0
  fi
  for try in 1 2 3; do
    echo "=== $name (spp=${2:-budget}) attempt $try $(date +%T)"
    if timeout 9000 python -m ppg_tpu.tools.parity --scene "$name" \
        ${2:+--spp $2} --self-ratio > /tmp/parity_one_r4.log 2>&1; then
      grep -E '^\{' /tmp/parity_one_r4.log >> "$RES"
      echo "=== $name OK"; return 0
    fi
    echo "=== $name attempt $try FAILED (rc=$?)"
    tail -3 /tmp/parity_one_r4.log
    sleep 30
  done
  echo "=== $name GAVE UP"
  return 1
}
run cbox ""
run cbox-improved ""
run spaceship ""
run spaceship-improved ""
run kitchen 256
run kitchen-improved 256
echo "=== campaign done ==="
cat "$RES"
