#!/usr/bin/env bash
# Launch the API server with the studio web UI at http://HOST:PORT/
set -euo pipefail
cd "$(dirname "$0")"
exec python -m acestep_tpu.serving.launch api --host 0.0.0.0 "$@"
