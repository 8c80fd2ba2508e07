"""Training loop: LoRA / full flow-matching fine-tune with checkpoint/resume.

Analog of acestep/training/trainer.py (LoRATrainer :483, Fabric loop :614-979):
warmup+cosine AdamW, grad-NaN auditing, periodic checkpoints with optimizer
state, resume, and final adapter export (lora_utils.py:300-438).

Checkpoints use orbax (train state) + the native safetensors format for the
final exported adapter/weights.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np
import optax

from acestep_tpu.config import DiTConfig
from acestep_tpu.training.flow_matching import make_optimizer, make_train_step
from acestep_tpu.training.lora import apply_lora, init_lora, make_lora_train_step


@dataclasses.dataclass
class TrainConfig:
    lr: float = 1e-4
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 1000
    clip_norm: float = 1.0
    lora_rank: int = 16
    lora_alpha: float = 16.0
    lokr_factor: int = 8                # kron factorization target (mode=lokr)
    mode: str = "lora"                  # lora | lokr | full
    shift: float = 3.0
    checkpoint_every: int = 200
    log_every: int = 10


class Trainer:
    """Drives training over a batch iterator; owns opt/checkpoint state."""

    def __init__(
        self,
        base_params: Any,
        cfg: DiTConfig,
        train_cfg: TrainConfig,
        out_dir: str,
        seed: int = 0,
    ):
        self.base_params = base_params
        self.cfg = cfg
        self.tc = train_cfg
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.opt = make_optimizer(
            lr=train_cfg.lr, weight_decay=train_cfg.weight_decay,
            warmup_steps=train_cfg.warmup_steps, total_steps=train_cfg.total_steps,
            clip_norm=train_cfg.clip_norm,
        )
        key = jax.random.key(seed)
        if train_cfg.mode == "lora":
            self.trainable = init_lora(key, base_params, rank=train_cfg.lora_rank)
            self.step_fn = make_lora_train_step(
                base_params, cfg, self.opt, alpha=train_cfg.lora_alpha,
                shift=train_cfg.shift,
            )
        elif train_cfg.mode == "lokr":
            # kron-factored adapter (reference training tab's LoKR mode,
            # gradio_ui/events/training_handlers.py:871-967)
            from acestep_tpu.training.lokr import init_lokr, make_lokr_train_step

            self.trainable = init_lokr(key, base_params,
                                       factor=train_cfg.lokr_factor)
            self.step_fn = make_lokr_train_step(
                base_params, cfg, self.opt, alpha=train_cfg.lora_alpha,
                shift=train_cfg.shift,
            )
        elif train_cfg.mode == "full":
            self.trainable = base_params
            self.step_fn = make_train_step(cfg, self.opt, shift=train_cfg.shift)
        else:
            raise ValueError(f"mode={train_cfg.mode!r}: expected lora|lokr|full")
        self.opt_state = self.opt.init(self.trainable)
        self.step = 0
        self.history: list = []
        self._key = jax.random.key(seed + 1)

    # -- checkpointing -------------------------------------------------------

    def _ckpt_dir(self, step: int) -> str:
        return os.path.join(self.out_dir, f"ckpt_{step:07d}")

    def save_checkpoint(self) -> str:
        import orbax.checkpoint as ocp

        path = os.path.abspath(self._ckpt_dir(self.step))
        # batch the device->host fetch into ONE transfer before orbax
        # serializes: per-leaf fetches stack one tunnel roundtrip (~27 ms)
        # per array, which turns a ~200 MB optimizer-state save into minutes
        # on remote-device backends
        state = jax.device_get(
            {"trainable": self.trainable, "opt_state": self.opt_state})
        with ocp.PyTreeCheckpointer() as ckptr:
            # force=True: resume-at-step-N followed by save_checkpoint() must
            # be idempotent (a killed run re-saves its last step on restart)
            ckptr.save(path, state, force=True)
        with open(path + ".meta.json", "w") as f:
            json.dump({"step": self.step, "history": self.history[-100:]}, f)
        return path

    def resume(self, step: Optional[int] = None) -> bool:
        import orbax.checkpoint as ocp

        if step is None:
            ckpts = sorted(
                d for d in os.listdir(self.out_dir)
                if d.startswith("ckpt_") and not d.endswith(".meta.json")
            )
            if not ckpts:
                return False
            step = int(ckpts[-1].split("_")[1])
        path = os.path.abspath(self._ckpt_dir(step))
        item = {"trainable": self.trainable, "opt_state": self.opt_state}
        # restore to HOST numpy, not onto the device: orbax's tensorstore
        # restore issues device transfers from multiple worker threads, which
        # deadlocks single-client remote-device tunnels; the next train step's
        # normal jit transfer moves the state to the device safely
        import numpy as _np

        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=_np.ndarray), item)
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(path, item=item, restore_args=restore_args)
        self.trainable = restored["trainable"]
        self.opt_state = restored["opt_state"]
        meta_path = path + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.step = meta["step"]
            self.history = meta.get("history", [])
        else:
            self.step = step
        return True

    def export(self, name: str = "adapter") -> str:
        """Export the trained weights (LoRA tree or full params) to the native
        safetensors format (lora_utils.py:417-438 final adapter export)."""
        from acestep_tpu import loader

        path = os.path.join(self.out_dir, name)
        loader.save_params(path, self.trainable, {"mode": self.tc.mode,
                                                  "step": str(self.step)})
        return path

    def merged_params(self) -> Any:
        if self.tc.mode == "lora":
            return apply_lora(self.base_params, self.trainable, self.tc.lora_alpha)
        if self.tc.mode == "lokr":
            from acestep_tpu.training.lokr import apply_lokr

            return apply_lokr(self.base_params, self.trainable, self.tc.lora_alpha)
        return self.trainable

    # -- loop ----------------------------------------------------------------

    def train(
        self,
        batches: Iterator[Dict[str, Any]],
        max_steps: Optional[int] = None,
        log_fn: Callable[[str], None] = print,
        metrics: Optional["MetricsLogger"] = None,
    ) -> Dict[str, Any]:
        max_steps = max_steps or self.tc.total_steps
        t0 = time.perf_counter()
        for batch in batches:
            if self.step >= max_steps:
                break
            self._key, sub = jax.random.split(self._key)
            self.trainable, self.opt_state, loss = self.step_fn(
                self.trainable, self.opt_state, batch, sub
            )
            self.step += 1
            loss_f = float(loss)
            self.history.append(loss_f)
            if metrics is not None:
                metrics.scalar("train/loss", loss_f, self.step)
            if self.step % self.tc.log_every == 0:
                log_fn(f"step {self.step}: loss {loss_f:.5f} "
                       f"({self.step / (time.perf_counter() - t0):.2f} it/s)")
                if metrics is not None:
                    metrics.scalar(
                        "train/it_per_s",
                        self.step / (time.perf_counter() - t0), self.step)
            if self.tc.checkpoint_every and self.step % self.tc.checkpoint_every == 0:
                self.save_checkpoint()
        if metrics is not None:
            metrics.flush()
        return {"steps": self.step, "final_loss": self.history[-1] if self.history else None}


class MetricsLogger:
    """Structured JSONL scalar log (the environment has no TensorBoard; the
    reference logs to TB, trainer.py:23-24 — this writes one event per line:
    {"step", "tag", "value", "wall"} consumable by any plotting tool)."""

    def __init__(self, path: str):
        import os as _os

        _os.makedirs(_os.path.dirname(_os.path.abspath(path)) or ".", exist_ok=True)
        self.path = path
        self._buf: list = []

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._buf.append({"step": int(step), "tag": tag,
                          "value": float(value), "wall": time.time()})
        if len(self._buf) >= 64:
            self.flush()

    def flush(self) -> None:
        if not self._buf:
            return
        import json as _json

        with open(self.path, "a") as f:
            for ev in self._buf:
                f.write(_json.dumps(ev) + "\n")
        self._buf.clear()
