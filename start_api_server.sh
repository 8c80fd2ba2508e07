#!/usr/bin/env bash
# Launch the async-job REST API server (reference start_api_server.sh analog).
set -euo pipefail
cd "$(dirname "$0")"
export ACESTEP_TPU_QUANT="${ACESTEP_TPU_QUANT:-q8_0}"
exec python -m acestep_tpu.serving.launch api "$@"
