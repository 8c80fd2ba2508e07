#!/usr/bin/env bash
# Stop a running acestep_tpu API server (analog of the reference's
# close_api_server.sh).  Finds the EXACT pid listening on the port and kills
# it only if its command line is ours — NEVER pattern-kills (a pattern can
# match unrelated processes; on the shared TPU tunnel that wedges the chip
# for ~10 min).
#
# Usage: ./close_api_server.sh [--port 8001] [--pid PID] [--force]
set -euo pipefail

PORT=8001 PID="" FORCE=0
while [[ $# -gt 0 ]]; do
  case "$1" in
    --port) PORT="$2"; shift ;;
    --pid)  PID="$2"; shift ;;
    --force) FORCE=1 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
  shift
done

pids=()
if [[ -n "$PID" ]]; then
  pids=("$PID")
else
  # ss prints pid=N inside the process column
  while IFS= read -r p; do pids+=("$p"); done < <(
    ss -tlnp 2>/dev/null | awk -v port=":$PORT" '$4 ~ port"$"' \
      | grep -oP 'pid=\K[0-9]+' | sort -u)
  if [[ ${#pids[@]} -eq 0 ]]; then
    echo "nothing listening on :$PORT"
    exit 0
  fi
fi

for p in "${pids[@]}"; do
  cmd=$(tr '\0' ' ' < "/proc/$p/cmdline" 2>/dev/null || true)
  if [[ "$FORCE" != 1 ]] && ! grep -qE "acestep|api_server|start_api" <<< "$cmd"; then
    echo "[skip] pid $p on :$PORT is not an acestep server ($cmd) — use --force"
    continue
  fi
  echo "[stop] pid $p ($cmd)"
  kill "$p" 2>/dev/null || true
  for _ in $(seq 1 20); do
    kill -0 "$p" 2>/dev/null || break
    sleep 0.25
  done
  kill -0 "$p" 2>/dev/null && { echo "[stop] pid $p ignored TERM, sending KILL"; kill -9 "$p"; }
done
