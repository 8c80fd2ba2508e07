#!/usr/bin/env python
"""Environment detection report (reference test_env_detection.sh / check_gpu.py
analog — acestep/gpu_config.py:286-405 detects VRAM and picks a tier; here we
detect the JAX backend, device memory, topology tier, native library and
compile-cache state, and the resolved settings registry).

Usage: python tools/check_env.py [--json]
Exit code 0 if the stack is usable (any JAX backend initialises), 1 otherwise.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect() -> dict:
    info: dict = {"python": sys.version.split()[0]}

    try:
        import jax

        info["jax"] = jax.__version__
        devs = jax.devices()
        info["backend"] = devs[0].platform
        info["devices"] = len(devs)
        info["device_kind"] = devs[0].device_kind
    except Exception as e:  # noqa: BLE001 — report, don't crash the probe
        info["jax_error"] = f"{type(e).__name__}: {e}"
        return info

    from acestep_tpu.memory_planner import detect_hbm_bytes
    from acestep_tpu.parallel.mesh import tier_for

    info["hbm_bytes"] = detect_hbm_bytes()
    info["hbm_gib"] = round(info["hbm_bytes"] / 2**30, 1)
    tier = tier_for(info["devices"])
    info["topology_tier"] = {
        "label": f"dp{tier.dp}xtp{tier.tp}",
        "dp": tier.dp, "tp": tier.tp,
        "max_batch": tier.max_batch, "max_duration_s": tier.max_duration_s,
    }

    # native threaded quantizer (C++): optional fast path for conversion
    try:
        from acestep_tpu.native import get_native

        info["native_quant"] = get_native() is not None
    except Exception:
        info["native_quant"] = False

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    info["compile_cache"] = (
        len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    )

    try:
        from acestep_tpu.settings import Settings

        s = Settings.load(n_devices=info["devices"])
        info["settings"] = s.describe()
    except Exception as e:  # noqa: BLE001
        info["settings_error"] = f"{type(e).__name__}: {e}"
    return info


def main() -> int:
    info = collect()
    if "--json" in sys.argv[1:]:
        print(json.dumps(info, indent=2, default=str))
    else:
        for k, v in info.items():
            if k == "settings":
                print(f"{k}:\n{v}")
            else:
                print(f"{k}: {v}")
    return 0 if "jax_error" not in info else 1


if __name__ == "__main__":
    sys.exit(main())
