#!/usr/bin/env bash
# Environment detection for acestep_tpu hosts (analog of the reference's
# test_env_detection.sh): verifies the python/jax stack, TPU visibility, the
# native toolchain the quantizer bridge builds with, and serving prereqs.
# Exit code 0 = ready to serve; 1 = something required is missing.
set -uo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")"

FAIL=0
pass() { echo "[PASS] $*"; }
warn() { echo "[WARN] $*"; }
fail() { echo "[FAIL] $*"; FAIL=1; }

echo "== acestep_tpu environment detection =="
echo "[info] platform: $(uname) $(uname -m)"

# 1. python + core stack
PY="${PYTHON:-python}"
if command -v "$PY" >/dev/null; then
  pass "python: $("$PY" --version 2>&1)"
else
  fail "python not found (set \$PYTHON)"; exit 1
fi

"$PY" - <<'EOF' || FAIL=1
import importlib, sys
need = ["jax", "numpy", "optax", "orbax.checkpoint"]
opt = ["transformers", "torch"]
for m in need:
    try:
        mod = importlib.import_module(m)
        print(f"[PASS] {m} {getattr(mod, '__version__', '')}")
    except Exception as e:
        print(f"[FAIL] {m}: {e}"); sys.exit(1)
for m in opt:
    try:
        mod = importlib.import_module(m)
        print(f"[PASS] {m} {getattr(mod, '__version__', '')} (optional)")
    except Exception:
        print(f"[WARN] {m} missing (optional: parity tests / CLAP gate)")
EOF

# 2. accelerator visibility.  Skipped with ACESTEP_TPU_SKIP_DEVICE_PROBE=1:
#    on single-client tunnels only ONE process may hold the TPU, so probing
#    while a server/bench is running must be avoidable.
if [[ "${ACESTEP_TPU_SKIP_DEVICE_PROBE:-0}" == 1 ]]; then
  warn "device probe skipped (ACESTEP_TPU_SKIP_DEVICE_PROBE=1)"
elif timeout 60 "$PY" - <<'EOF'
import jax
devs = jax.devices()
kinds = {d.platform for d in devs}
print(f"[info] jax devices: {len(devs)} x {sorted(kinds)}")
if any(p in ("tpu", "axon") for p in kinds):
    print("[PASS] TPU visible")
else:
    print("[WARN] no TPU visible — serving will run on", sorted(kinds))
EOF
then :; else warn "device probe timed out (tunnel busy or wedged)"; fi

# 3. native toolchain (quant_native builds lazily at first conversion)
for tool in g++ cmake make; do
  if command -v "$tool" >/dev/null; then pass "$tool: $(command -v $tool)"
  else warn "$tool missing — native quantizer falls back to numpy (~20x slower conversions)"; fi
done

# 4. compile cache + scratch space
if [[ -d .jax_cache ]]; then
  pass ".jax_cache present ($(du -sh .jax_cache 2>/dev/null | cut -f1))"
else
  warn ".jax_cache absent — first run compiles from scratch"
fi
AVAIL=$(df -Pk . | awk 'NR==2 {print int($4/1024)}')
if [[ "${AVAIL:-0}" -lt 1024 ]]; then
  warn "under 1 GB free on this volume (${AVAIL} MB) — long-song WAVs are ~100 MB each"
else
  pass "disk: ${AVAIL} MB free"
fi

echo
if [[ "$FAIL" == 0 ]]; then echo "== ready =="; else echo "== NOT ready =="; fi
exit "$FAIL"
