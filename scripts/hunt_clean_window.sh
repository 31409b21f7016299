#!/bin/bash
# Clean-host-window hunter (BENCH/BASELINE.md host-incident protocol,
# round-3 pattern): poll the fixed-work host canary every ~150 s and run
# the given command only when the single-core matmul probe is inside the
# known-good band (<= 0.5 s on this VM). Usage:
#   scripts/hunt_clean_window.sh <logfile> <cmd...>
set -u
LOG="$1"; shift
cd "$(dirname "$0")/.."
for i in $(seq 1 80); do
  M=$(python - <<'EOF'
import sys
sys.path.insert(0, "scripts")
from bench_scaling import host_canary
print(host_canary()["matmul_s"])
EOF
)
  echo "$(date -u +%H:%M:%S) canary matmul=${M}s" >> "$LOG"
  if python -c "import sys; sys.exit(0 if float('${M}') <= 0.5 else 1)"; then
    echo "$(date -u +%H:%M:%S) clean window -> running: $*" >> "$LOG"
    "$@" >> "$LOG" 2>&1
    echo "EXIT=$?" >> "$LOG"
    exit 0
  fi
  sleep 150
done
echo "no clean window found in budget" >> "$LOG"
exit 1
