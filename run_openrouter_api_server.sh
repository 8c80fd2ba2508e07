#!/usr/bin/env bash
# Launch the OpenRouter-compatible chat-completions server.
set -euo pipefail
cd "$(dirname "$0")"
exec python -m acestep_tpu.serving.launch openrouter "$@"
