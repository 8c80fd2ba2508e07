"""Inference-time LoRA adapter manager (reference core/lora/{service,registry,
scaling}.py: load/unload/rescale adapters on a serving engine without restart).

Adapters are merged into the engine's DiT params (requantizing quantized
kernels — training/lora.py apply_lora handles QuantTensor leaves); the manager
keeps the pristine base params so unload/rescale restore exactly.  Engine jit
caches keep working because param STRUCTURE is unchanged — only leaf values
swap, so compiled graphs are reused across adapter switches.
"""

from __future__ import annotations

import threading
from typing import Any, Dict, List, Optional

from acestep_tpu import loader as loader_mod


class LoRARuntime:
    """Owns the engine's base DiT params + the active adapter registry.

    ``base_params`` is the UNSTACKED DiT param tree (as loaded from a
    checkpoint — adapters train against per-layer 2-D kernels); merges happen
    on it, then the result is stacked (and mesh-sharded when the engine runs
    multi-chip) before being swapped into the engine."""

    def __init__(self, engine, base_params: Any):
        self.engine = engine
        self._base = base_params                    # pristine unstacked tree
        self._lock = threading.Lock()
        self._registry: Dict[str, Dict[str, Any]] = {}   # name -> {lora, alpha, scale}
        self._active: List[str] = []

    # -- registry ------------------------------------------------------------

    def register(self, name: str, lora_params: Any, alpha: float = 16.0) -> None:
        """Add an adapter to the registry (does not activate it)."""
        with self._lock:
            self._registry[name] = {"lora": lora_params, "alpha": alpha, "scale": 1.0}

    def register_from_dir(self, name: str, path: str, alpha: float = 16.0) -> None:
        """Load a saved adapter (loader.save_params layout) and register it."""
        self.register(name, loader_mod.load_params(path), alpha)

    def unregister(self, name: str) -> None:
        with self._lock:
            self._registry.pop(name, None)
            if name in self._active:
                self._active.remove(name)
                self._rebuild_locked()

    def list_adapters(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            return {
                n: {"alpha": e["alpha"], "scale": e["scale"],
                    "active": n in self._active}
                for n, e in self._registry.items()
            }

    # -- activation ----------------------------------------------------------

    def activate(self, name: str, scale: float = 1.0) -> None:
        """Merge an adapter into the engine (stacking on any already-active)."""
        with self._lock:
            if name not in self._registry:
                raise KeyError(f"unknown adapter: {name}")
            self._registry[name]["scale"] = scale
            if name not in self._active:
                self._active.append(name)
            self._rebuild_locked()

    def set_scale(self, name: str, scale: float) -> None:
        with self._lock:
            if name not in self._registry:
                raise KeyError(f"unknown adapter: {name}")
            self._registry[name]["scale"] = scale
            if name in self._active:
                self._rebuild_locked()

    def deactivate(self, name: str) -> None:
        with self._lock:
            if name in self._active:
                self._active.remove(name)
                self._rebuild_locked()

    def deactivate_all(self) -> None:
        with self._lock:
            self._active.clear()
            self._rebuild_locked()

    # -- merge ---------------------------------------------------------------

    def _rebuild_locked(self) -> None:
        """Re-merge all active adapters onto the pristine base, then restack
        (and reshard under a mesh) for the engine."""
        from acestep_tpu.models import dit
        from acestep_tpu.ops.qlinear import precast_quant_scales
        from acestep_tpu.training.lora import apply_lora, scale_lora

        params = self._base
        for name in self._active:
            entry = self._registry[name]
            lora = entry["lora"]
            if entry["scale"] != 1.0:
                lora = scale_lora(lora, entry["scale"])
            params = apply_lora(params, lora, alpha=entry["alpha"])
        stacked = dit.stack_params(params)
        if getattr(self.engine, "mesh", None) is not None:
            from acestep_tpu.parallel.sharding import shard_params

            stacked = shard_params(stacked, self.engine.mesh)
        else:
            import os

            # same single-device layout the engine built at init (fused
            # qkv/gate-up) so LoRA toggles don't change the jit param structure
            if os.environ.get("ACESTEP_TPU_DIT_FUSE", "1") != "0":
                stacked = dit.fuse_params(stacked)
        # engine init precasts too (pipeline.py __init__); matching here keeps
        # the jit param structure identical across adapter swaps
        self.engine.dit_params = precast_quant_scales(stacked)
