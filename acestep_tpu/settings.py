"""Layered runtime settings (SURVEY §5.6: the reference stacks .env ->
argparse -> GPU-tier defaults -> ACE_GGML_* env knobs; this provides the
coherent TPU analog).

Resolution order (highest wins):
  1. explicit overrides (constructor kwargs / CLI)
  2. process environment (ACESTEP_TPU_* namespace)
  3. .env file in the working directory (KEY=VALUE lines, # comments)
  4. topology-tier defaults (device count -> batch/duration/quant defaults)
  5. built-in defaults

Every knob the scattered modules read from the environment is declared here
with its type and default, so ``Settings.load().apply_env()`` can materialize
a consistent environment for child modules, and ``describe()`` documents the
whole flag surface in one place.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

# knob -> (env var, type, default)
KNOBS = {
    "quant": ("ACESTEP_TPU_QUANT", str, "q8_0"),
    "lm_quant": ("ACESTEP_TPU_LM_QUANT", str, None),
    "sampler_mode": ("ACESTEP_TPU_SAMPLER", str, "scan"),          # scan | step
    "qmm_backend": ("ACESTEP_TPU_QMM_BACKEND", str, "auto"),       # auto | xla | pallas
    "int8_act": ("ACESTEP_TPU_INT8_ACT", bool, False),
    "kv_dtype": ("ACESTEP_TPU_KV_DTYPE", str, "int8"),             # int8 | fp8

    "stacked_weights": ("ACESTEP_TPU_STACKED_W", str, None),       # 0|1 forces; default per call site
    "blocked_attn_min": ("ACESTEP_TPU_BLOCKED_ATTN_MIN", int, 1536),
    "vae_window_batch": ("ACESTEP_TPU_VAE_WINDOW_BATCH", int, None),
    "vae_segment_windows": ("ACESTEP_TPU_VAE_SEGMENT_WINDOWS", int, None),  # 0 disables overlap
    "max_hbm_gb": ("ACESTEP_TPU_MAX_HBM_GB", float, None),
    "api_key": ("ACESTEP_TPU_API_KEY", str, None),
    "genres_file": ("ACESTEP_TPU_GENRES_FILE", str, None),
    "progress_cache": ("ACESTEP_TPU_PROGRESS_CACHE", str, None),
    "compile_cache": ("ACESTEP_TPU_COMPILE_CACHE", str, ".jax_cache"),
    "vae_dtype": ("ACESTEP_TPU_VAE_DTYPE", str, "f32"),
    "request_log": ("ACESTEP_TPU_REQUEST_LOG", str, None),
}


def _parse(t, raw: str):
    if t is bool:
        return raw.strip().lower() in ("1", "true", "yes", "on")
    return t(raw)


def read_env_file(path: str = ".env") -> Dict[str, str]:
    out: Dict[str, str] = {}
    try:
        with open(path, encoding="utf-8") as f:
            for ln in f:
                ln = ln.strip()
                if not ln or ln.startswith("#") or "=" not in ln:
                    continue
                k, _, v = ln.partition("=")
                out[k.strip()] = v.strip().strip('"').strip("'")
    except OSError:
        pass
    return out


@dataclasses.dataclass
class Settings:
    values: Dict[str, Any]
    sources: Dict[str, str]

    @classmethod
    def load(cls, env_file: str = ".env", n_devices: Optional[int] = None,
             **overrides) -> "Settings":
        file_env = read_env_file(env_file)
        values: Dict[str, Any] = {}
        sources: Dict[str, str] = {}

        # 5) built-ins, 4) tier defaults
        tier_defaults: Dict[str, Any] = {}
        if n_devices is not None:
            from acestep_tpu.parallel.mesh import tier_for

            tier = tier_for(n_devices)
            tier_defaults = {
                "max_batch": tier.max_batch,
                "max_duration_s": tier.max_duration_s,
                "dp": tier.dp,
                "tp": tier.tp,
            }
        for name, (env, t, default) in KNOBS.items():
            values[name] = default
            sources[name] = "default"
            if env in file_env:
                try:
                    values[name] = _parse(t, file_env[env])
                    sources[name] = env_file
                except (TypeError, ValueError):
                    pass
            if os.environ.get(env) is not None:
                try:
                    values[name] = _parse(t, os.environ[env])
                    sources[name] = "env"
                except (TypeError, ValueError):
                    pass
        for k, v in tier_defaults.items():
            values.setdefault(k, v)
            sources.setdefault(k, "tier")
        # 1) explicit overrides
        for k, v in overrides.items():
            if v is not None:
                values[k] = v
                sources[k] = "override"
        return cls(values, sources)

    def __getattr__(self, name):
        values = object.__getattribute__(self, "values")
        if name in values:
            return values[name]
        raise AttributeError(name)

    def apply_env(self) -> None:
        """Write resolved knobs back into os.environ so modules that read the
        environment directly (sampler mode, qmm backend, attention threshold,
        VAE window batch) see the layered result."""
        for name, (env, t, _d) in KNOBS.items():
            v = self.values.get(name)
            if v is None:
                continue
            os.environ[env] = str(int(v)) if t is bool else str(v)

    def describe(self) -> str:
        lines = ["setting            value        source", "-" * 44]
        for k in sorted(self.values):
            lines.append(f"{k:<18} {str(self.values[k]):<12} {self.sources.get(k, '?')}")
        return "\n".join(lines)
