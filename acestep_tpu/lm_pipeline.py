"""LM planner pipeline: prompts, two-phase CoT -> codes generation, output parsing.

TPU-native analog of acestep/llm_inference.py LLMHandler:
  * prompt builders replicate the fine-tune chat format byte-for-byte
    (llm_inference.py:1425-1573; Qwen chat template with the reference's
    instruction strings);
  * ``generate_with_stop_condition`` runs Phase 1 (CoT metadata, stop at
    ``</think>``) then Phase 2 (5 Hz audio codes with duration-constrained EOS:
    blocked until target_duration*5 codes, forced right after —
    constrained_logits_processor.py:155-156, :1606-1628);
  * ``parse_lm_output`` parses the YAML-ish CoT block (llm_inference.py:2473-2597
    semantics: multi-line values, int coercion for bpm/duration).

Tokenization is pluggable: any object with encode/decode + the special-token ids
(HF tokenizers adapter provided; tests use a mock).
"""

from __future__ import annotations

import dataclasses
import os
import re
import time
from typing import Any, Dict, List, Optional, Protocol, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import QwenConfig
from acestep_tpu.constants import (
    AUDIO_CODEBOOK_SIZE,
    DEFAULT_LM_INSTRUCTION,
    DEFAULT_LM_INSPIRED_INSTRUCTION,
    DEFAULT_LM_REWRITE_INSTRUCTION,
    DEFAULT_LM_UNDERSTAND_INSTRUCTION,
    DEFAULT_NEGATIVE_PROMPT,
    LM_CODE_RATE,
)
from acestep_tpu.serving import SamplingParams, generate
from acestep_tpu.serving import kv_cache as kvc
from acestep_tpu.serving import lm as lm_serving

CODE_PATTERN = re.compile(r"<\|audio_code_(\d+)\|>")

METADATA_KEYS = ("bpm", "caption", "duration", "genres", "keyscale", "language", "timesignature")


# ---------------------------------------------------------------------------
# tokenizer protocol
# ---------------------------------------------------------------------------

class TokenizerLike(Protocol):
    def encode(self, text: str) -> List[int]: ...
    def decode(self, ids: Sequence[int]) -> str: ...

    # special ids
    eos_token_id: int
    think_end_id: int            # token id of "</think>"
    audio_code_base_id: int      # id of <|audio_code_0|>; codes are contiguous


@dataclasses.dataclass
class TokenizerJsonAdapter:
    """Wraps a raw tokenizer.json via the `tokenizers` library (no transformers
    needed — checkpoints ship tokenizer.json)."""

    path: str
    eos_token: str = "<|im_end|>"

    def __post_init__(self):
        from tokenizers import Tokenizer

        self.tok = Tokenizer.from_file(self.path)
        self.eos_token_id = self.tok.token_to_id(self.eos_token)
        if self.eos_token_id is None:
            self.eos_token_id = self.tok.token_to_id("<|endoftext|>") or 0
        ids = self.tok.encode("</think>", add_special_tokens=False).ids
        self.think_end_id = ids[-1] if len(ids) == 1 else -1
        base = self.tok.token_to_id("<|audio_code_0|>")
        self.audio_code_base_id = base if base is not None else -1

    def encode(self, text: str):
        return self.tok.encode(text, add_special_tokens=False).ids

    def decode(self, ids):
        return self.tok.decode(list(ids), skip_special_tokens=False)


@dataclasses.dataclass
class HFTokenizerAdapter:
    """Wraps a HuggingFace tokenizer (from the LM checkpoint)."""

    tok: Any
    eos_token_id: int = -1
    think_end_id: int = -1
    audio_code_base_id: int = -1

    def __post_init__(self):
        if self.eos_token_id < 0:
            self.eos_token_id = self.tok.eos_token_id
        if self.think_end_id < 0:
            ids = self.tok.encode("</think>", add_special_tokens=False)
            self.think_end_id = ids[-1] if len(ids) == 1 else -1
        if self.audio_code_base_id < 0:
            self.audio_code_base_id = self.tok.convert_tokens_to_ids("<|audio_code_0|>")

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int]) -> str:
        return self.tok.decode(list(ids))


# ---------------------------------------------------------------------------
# chat template (Qwen3 format; matches apply_chat_template output)
# ---------------------------------------------------------------------------

def apply_chat_template(
    messages: Sequence[Dict[str, str]], add_generation_prompt: bool = True
) -> str:
    parts = []
    for m in messages:
        parts.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
    if add_generation_prompt:
        parts.append("<|im_start|>assistant\n")
    out = "".join(parts)
    if not add_generation_prompt and out.endswith("<|im_end|>\n"):
        # codes phase continues INSIDE the assistant turn after the CoT
        out = out[: -len("<|im_end|>\n")]
    return out


def _has_meaningful_negative(negative_prompt: str) -> bool:
    return bool(negative_prompt) and negative_prompt.strip() not in ("", DEFAULT_NEGATIVE_PROMPT)


def build_formatted_prompt(
    caption: str,
    lyrics: str = "",
    is_negative_prompt: bool = False,
    generation_phase: str = "cot",
    negative_prompt: str = DEFAULT_NEGATIVE_PROMPT,
) -> str:
    """Phase-1 (CoT) prompt (llm_inference.py:1425-1472)."""
    if is_negative_prompt:
        if generation_phase == "cot":
            if _has_meaningful_negative(negative_prompt):
                prompt = f"# Caption\n{negative_prompt}\n\n# Lyric\n{lyrics}\n"
            else:
                prompt = f"# Lyric\n{lyrics}\n"
        else:
            prompt = caption
    else:
        prompt = f"# Caption\n{caption}\n\n# Lyric\n{lyrics}\n"
    return apply_chat_template(
        [
            {"role": "system", "content": f"# Instruction\n{DEFAULT_LM_INSTRUCTION}\n\n"},
            {"role": "user", "content": prompt},
        ],
        add_generation_prompt=True,
    )


def build_formatted_prompt_with_cot(
    caption: str,
    lyrics: str,
    cot_text: str,
    is_negative_prompt: bool = False,
    negative_prompt: str = DEFAULT_NEGATIVE_PROMPT,
) -> str:
    """Phase-2 (codes) prompt with the CoT in the assistant turn
    (llm_inference.py:1474-1532)."""
    if is_negative_prompt:
        cot_for_prompt = "<think>\n</think>"
        caption_for_prompt = (
            negative_prompt if _has_meaningful_negative(negative_prompt) else caption
        )
    else:
        cot_for_prompt = cot_text
        caption_for_prompt = caption
    user_prompt = f"# Caption\n{caption_for_prompt}\n\n# Lyric\n{lyrics}\n"
    formatted = apply_chat_template(
        [
            {"role": "system", "content": f"# Instruction\n{DEFAULT_LM_INSTRUCTION}\n\n"},
            {"role": "user", "content": user_prompt},
            {"role": "assistant", "content": cot_for_prompt},
        ],
        add_generation_prompt=False,
    )
    if not formatted.endswith("\n"):
        formatted += "\n"
    return formatted


def build_understanding_prompt(
    audio_codes: str, is_negative_prompt: bool = False,
    negative_prompt: str = DEFAULT_NEGATIVE_PROMPT,
) -> str:
    user_content = (
        (negative_prompt if negative_prompt and negative_prompt.strip() else "")
        if is_negative_prompt else audio_codes
    )
    return apply_chat_template(
        [
            {"role": "system",
             "content": f"# Instruction\n{DEFAULT_LM_UNDERSTAND_INSTRUCTION}\n\n"},
            {"role": "user", "content": user_content},
        ],
        add_generation_prompt=True,
    )


def build_sample_prompt(query: str, instruction: str = DEFAULT_LM_INSPIRED_INSTRUCTION) -> str:
    return apply_chat_template(
        [
            {"role": "system", "content": f"# Instruction\n{instruction}\n\n"},
            {"role": "user", "content": query},
        ],
        add_generation_prompt=True,
    )


# ---------------------------------------------------------------------------
# output parsing
# ---------------------------------------------------------------------------

def postprocess_caption(value: str) -> str:
    """Collapse YAML multi-line caption values into one line."""
    lines = [ln.strip() for ln in value.split("\n")]
    return " ".join(ln for ln in lines if ln).strip()


def parse_lm_output(output_text: str) -> Tuple[Dict[str, Any], str]:
    """Extract (metadata, audio_codes_string) from an LM completion
    (semantics of llm_inference.py:2473-2597)."""
    metadata: Dict[str, Any] = {}
    audio_codes = "".join(
        f"<|audio_code_{m}|>" for m in CODE_PATTERN.findall(output_text)
    )

    reasoning_text = None
    for pattern in (r"<think>(.*?)</think>", r"<reasoning>(.*?)</reasoning>"):
        m = re.search(pattern, output_text, re.DOTALL)
        if m:
            reasoning_text = m.group(1).strip()
            break
    if reasoning_text is None:
        before = output_text.split("<|audio_code_")[0] if "<|audio_code_" in output_text else output_text
        reasoning_text = before.strip()

    current_key: Optional[str] = None
    current_lines: List[str] = []

    def save():
        nonlocal current_key, current_lines
        if current_key and current_lines:
            value = "\n".join(current_lines)
            if current_key in ("bpm", "duration"):
                try:
                    metadata[current_key] = int(value.strip())
                except ValueError:
                    metadata[current_key] = value.strip()
            elif current_key == "caption":
                metadata["caption"] = postprocess_caption(value)
            elif current_key in METADATA_KEYS:
                metadata[current_key] = value.strip()
        current_key = None
        current_lines = []

    for line in reasoning_text.split("\n"):
        if line.strip().startswith("<"):
            continue
        if line and not line[0].isspace() and ":" in line:
            save()
            key, _, first = line.partition(":")
            current_key = key.strip().lower()
            if first.strip():
                current_lines.append(first)
        elif line.startswith((" ", "\t")) and current_key:
            current_lines.append(line)
    save()
    return metadata, audio_codes


def codes_to_indices(audio_codes: str) -> np.ndarray:
    return np.asarray([int(m) for m in CODE_PATTERN.findall(audio_codes)], np.int32)


def indices_to_codes(indices: Sequence[int]) -> str:
    return "".join(f"<|audio_code_{int(i)}|>" for i in indices)


def metadata_to_cot(metadata: Dict[str, Any]) -> str:
    """Render a metadata dict back into the canonical CoT block."""
    lines = [f"{k}: {metadata[k]}" for k in METADATA_KEYS if k in metadata]
    return "<think>\n" + "\n".join(lines) + "\n</think>"


# ---------------------------------------------------------------------------
# two-phase pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LMResult:
    metadata: Dict[str, Any]
    cot_text: str
    audio_codes: str
    code_indices: np.ndarray
    time_costs: Dict[str, float]
    # batch candidate code sequences (codes phase batch_size > 1); [0] == code_indices
    candidates: Optional[List[np.ndarray]] = None


# code-count buckets: durations 10-600 s -> 50-3000 codes; phase-2 scans compile
# once per bucket, forced-EOS/min-tokens are traced per-item operands
CODE_BUCKETS = (64, 128, 256, 512, 768, 1024, 1536, 2048, 2560, 3072)

# suffix buckets for the prefix-cache extend path (CoT blocks are short)
SUFFIX_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def code_bucket(n: int) -> int:
    for b in CODE_BUCKETS:
        if n <= b:
            return b
    return CODE_BUCKETS[-1]


def _suffix_bucket(n: int) -> int:
    for b in SUFFIX_BUCKETS:
        if n <= b:
            return b
    return SUFFIX_BUCKETS[-1]


class LMPipeline:
    """Owns the LM params + tokenizer and runs the two-phase generation.

    Serving features (round 2):
      * batched candidate generation in the codes phase (honors
        ``lm_batch_chunk_size`` via ``batch_size``/``chunk_size`` args —
        llm_inference.py:1252-1330 batch chunking);
      * KV prefix cache: the shared system+user prompt prefill from phase 1 is
        reused by phase 2 (grown + suffix-prefilled + broadcast to the batch —
        nano-vllm block_manager.py:44-50 prefix reuse in dense-cache form);
      * code-count bucketing with traced forced-EOS, so every duration in a
        bucket shares ONE compiled decode scan.
    """

    def __init__(self, params: Dict[str, Any], cfg: QwenConfig, tokenizer: TokenizerLike,
                 use_prefix_cache: bool = True, stack_layers: bool = True,
                 mesh=None):
        from acestep_tpu.models import qwen as _qwen

        # stacked layer axis -> serving prefill/decode scan ONE compiled layer
        # body instead of num_hidden_layers inlined copies
        if (stack_layers or mesh is not None) and isinstance(params.get("layers"), list):
            params = _qwen.stack_params(params)
        # tied-embedding quantized models get a quantized lm_head copy so the
        # decode scan never streams the full bf16 embed matrix (serving/lm.py)
        params = lm_serving.ensure_quantized_head(params)
        self.tp_ctx = None
        if mesh is not None:
            # tensor-parallel serving: rank-major-fused sharded params +
            # shard_map entry points (parallel/lm_tp.py — the nano-vllm TP
            # analog, linear.py:54-152 / embed_head.py)
            from acestep_tpu.parallel.lm_tp import LMTPContext

            self.tp_ctx = LMTPContext(params, cfg, mesh)
            params = self.tp_ctx.params
        # fuse q||k||v and gate||up (4 matmul kernels/layer instead of 7 —
        # batch-1 decode is launch-bound, and the fusion is numerically exact)
        elif os.environ.get("ACESTEP_TPU_LM_FUSE", "1") != "0":
            params = lm_serving.fuse_serving_params(params)
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.prefix_cache = lm_serving.PrefixCache(max_entries=8)
        self.use_prefix_cache = use_prefix_cache

    @staticmethod
    def _qmm_backend():
        """Trace-time qmm backend for LM dispatches.  "auto" (pallas on TPU,
        xla elsewhere): since the decode-shaped fat-tile kernels landed, the
        pallas path streams the quantized bytes at 1.84 ms/token vs the
        XLA-dequant path's 3.3 (0.6B q8_0; configs[2] LM phase 2.0 -> 1.5 s).
        ACESTEP_TPU_LM_QMM_BACKEND overrides."""
        from acestep_tpu.ops import qlinear

        return qlinear.trace_backend(
            os.environ.get("ACESTEP_TPU_LM_QMM_BACKEND", "auto"))

    @staticmethod
    def _bucket(ids):
        """Pad a token list to a length bucket so the jitted generate compiles
        once per (bucket, max_new) instead of once per prompt length."""
        for b in (64, 128, 256, 512, 1024, 2048, 4096):
            if len(ids) <= b:
                return ids + [0] * (b - len(ids))
        return ids[:4096]

    def _run(self, prompt: str, sp: SamplingParams, key,
             uncond_prompt: Optional[str] = None) -> Tuple[np.ndarray, int]:
        ids = self.tok.encode(prompt)
        n = min(len(ids), 4096)
        prompt_ids = jnp.asarray([self._bucket(ids)], jnp.int32)
        lengths = jnp.asarray([n], jnp.int32)
        ukw = {}
        if uncond_prompt is not None and sp.cfg_scale != 1.0:
            uids = self.tok.encode(uncond_prompt)
            ukw = dict(
                uncond_prompt_ids=jnp.asarray([self._bucket(uids)], jnp.int32),
                uncond_prompt_lengths=jnp.asarray([min(len(uids), 4096)], jnp.int32),
            )
        with self._qmm_backend():
            if self.tp_ctx is not None:
                tokens, n_gen = self.tp_ctx.generate(
                    prompt_ids, lengths, key, sp, **ukw)
            else:
                tokens, n_gen = generate(
                    self.params, self.cfg, prompt_ids, lengths, key, sp, **ukw)
        n = int(n_gen[0])
        return np.asarray(tokens[0, :n]), n

    # -- prefix-cached prefill ----------------------------------------------

    def _prefill_state(self, ids, total_len: int, insert: bool = False):
        """Batch-1 prefill of ``ids`` into a cache with room for ``total_len``
        positions, reusing the longest cached token prefix.  Returns
        (cache, logits [1, V])."""
        ids = list(ids)[:4096]
        total_len = kvc.round_len(total_len)
        hit = self.prefix_cache.lookup(ids) if self.use_prefix_cache else None
        if hit is not None:
            n0, cache0, logits0 = hit
            cache = kvc.grow_cache(cache0, total_len)
            if n0 == len(ids):
                return cache, logits0
            rest = ids[n0:]
            bucket = _suffix_bucket(len(rest))
            suffix = jnp.asarray([rest + [0] * (bucket - len(rest))], jnp.int32)
            with self._qmm_backend():
                if self.tp_ctx is not None:
                    logits, cache = self.tp_ctx.extend_prefill(
                        cache, suffix, jnp.asarray([n0], jnp.int32),
                        jnp.asarray([len(rest)], jnp.int32))
                else:
                    logits, cache = lm_serving.extend_prefill_jit(
                        self.params, self.cfg, cache, suffix,
                        jnp.asarray([n0], jnp.int32),
                        jnp.asarray([len(rest)], jnp.int32),
                    )
        else:
            prompt_ids = jnp.asarray([self._bucket(ids)], jnp.int32)
            total_len = kvc.round_len(max(total_len, prompt_ids.shape[1] + 1))
            cache = kvc.init_cache(
                self.cfg.num_hidden_layers, 1, self.cfg.num_key_value_heads,
                total_len, self.cfg.head_dim,
            )
            with self._qmm_backend():
                if self.tp_ctx is not None:
                    logits, cache = self.tp_ctx.prefill(
                        prompt_ids, jnp.asarray([len(ids)], jnp.int32), cache)
                else:
                    logits, cache = lm_serving._prefill_jit(
                        self.params, self.cfg, prompt_ids,
                        jnp.asarray([len(ids)], jnp.int32), cache,
                    )
        if insert and self.use_prefix_cache:
            self.prefix_cache.insert(ids, cache, logits)
        return cache, logits

    def _decode_batch(
        self, cache, logits, sp: SamplingParams, key, batch: int,
        min_arr=None, forced_arr=None,
        ucache=None, ulogits=None,
    ):
        """Broadcast a batch-1 prefill state to ``batch`` candidate rows and run
        the decode scan; returns (tokens [B, max_new] np, n_gen [B] np)."""
        cache_b = kvc.broadcast_cache(cache, batch)
        logits_b = jnp.broadcast_to(logits, (batch, logits.shape[-1]))
        ukw = {}
        if ucache is not None:
            ukw = dict(ucache=kvc.broadcast_cache(ucache, batch),
                       ulogits=jnp.broadcast_to(ulogits, (batch, ulogits.shape[-1])))
        with self._qmm_backend():
            if self.tp_ctx is not None:
                tokens, n_gen = self.tp_ctx.decode_from_state(
                    cache_b, logits_b, key, sp,
                    min_tokens_arr=min_arr, forced_eos_arr=forced_arr, **ukw,
                )
            else:
                tokens, n_gen = lm_serving.decode_from_state(
                    self.params, self.cfg, cache_b, logits_b, key, sp,
                    min_tokens_arr=min_arr, forced_eos_arr=forced_arr, **ukw,
                )
        return np.asarray(tokens), np.asarray(n_gen)

    def generate_with_stop_condition(
        self,
        caption: str,
        lyrics: str = "",
        target_duration_s: Optional[float] = None,
        *,
        temperature: float = 0.85,
        metadata_temperature: Optional[float] = None,
        codes_temperature: Optional[float] = None,
        top_p: float = 0.95,
        top_k: int = 0,
        cfg_scale: float = 1.0,
        negative_prompt: str = DEFAULT_NEGATIVE_PROMPT,
        max_cot_tokens: int = 512,
        max_code_tokens: Optional[int] = None,
        user_metadata: Optional[Dict[str, Any]] = None,
        seed: int = 0,
        thinking: bool = True,
        batch_size: int = 1,
        chunk_size: int = 4,
        constrained_cot: bool = False,
    ) -> LMResult:
        """Phase 1 CoT -> parse metadata -> Phase 2 duration-constrained codes.

        ``batch_size`` > 1 generates that many candidate code sequences from the
        shared phase-1 CoT (chunked by ``chunk_size`` =
        GenerationConfig.lm_batch_chunk_size; llm_inference.py:1252-1330); the
        first candidate populates the LMResult, all are in ``candidates``.
        ``constrained_cot`` runs phase 1 under the metadata FSM
        (constrained_logits_processor.py:81+ analog)."""
        time_costs: Dict[str, float] = {}
        key = jax.random.key(seed)
        k1, k2 = jax.random.split(key)

        # distinct metadata- vs codes-phase temperatures ride the same knob
        # surface as the reference constrained processor
        # (llm_inference.py:199-233 metadata_temperature / codes_temperature);
        # None falls back to the shared ``temperature``
        t_meta = temperature if metadata_temperature is None else metadata_temperature
        t_codes = temperature if codes_temperature is None else codes_temperature

        metadata: Dict[str, Any] = dict(user_metadata or {})
        cot_text = ""
        if thinking:
            t0 = time.perf_counter()
            if constrained_cot:
                cot_text = self._run_cot_fsm(
                    caption, lyrics, metadata, k1,
                    temperature=t_meta, max_cot_tokens=max_cot_tokens,
                )
            else:
                cot_text = self._run_cot_free(
                    caption, lyrics, k1,
                    temperature=t_meta, top_p=top_p, top_k=top_k,
                    cfg_scale=cfg_scale, negative_prompt=negative_prompt,
                    max_cot_tokens=max_cot_tokens,
                )
            parsed, _ = parse_lm_output(cot_text)
            # user metadata wins over model CoT (inference.py:539-558 merge)
            for k, v in parsed.items():
                metadata.setdefault(k, v)
            time_costs["lm_phase1_time_cost"] = time.perf_counter() - t0
        else:
            cot_text = metadata_to_cot(metadata) if metadata else "<think>\n</think>"

        duration = target_duration_s or metadata.get("duration") or 30.0
        try:
            duration = float(duration)
        except (TypeError, ValueError):
            duration = 30.0
        n_codes = int(round(duration * LM_CODE_RATE))
        if max_code_tokens is not None:
            n_codes = min(n_codes, max_code_tokens)

        t0 = time.perf_counter()
        prompt2 = build_formatted_prompt_with_cot(caption, lyrics, cot_text or metadata_to_cot(metadata))
        base = self.tok.audio_code_base_id
        bucket = code_bucket(n_codes + 2)
        sp2 = SamplingParams(
            temperature=t_codes, top_p=top_p, top_k=top_k,
            max_new_tokens=bucket,
            allowed_range=(base, base + AUDIO_CODEBOOK_SIZE),
            eos_token=self.tok.eos_token_id,
            cfg_scale=cfg_scale,
        )
        ids2 = self.tok.encode(prompt2)
        total_len = len(self._bucket(ids2)) + bucket + 1
        cache, logits = self._prefill_state(ids2, total_len)
        ucache = ulogits = None
        if cfg_scale != 1.0:
            uncond2 = build_formatted_prompt_with_cot(
                caption, lyrics, "", is_negative_prompt=True,
                negative_prompt=negative_prompt,
            )
            uids = self.tok.encode(uncond2)
            ucache, ulogits = self._prefill_state(
                uids, len(self._bucket(uids)) + bucket + 1
            )

        candidates: List[np.ndarray] = []
        remaining = max(1, batch_size)
        ck = k2
        while remaining > 0:
            nb = min(remaining, max(1, chunk_size))
            ck, sub = jax.random.split(ck)
            min_arr = jnp.full((nb,), n_codes, jnp.int32)
            forced_arr = jnp.full((nb,), n_codes, jnp.int32)
            toks, n_gen = self._decode_batch(
                cache, logits, sp2, sub, nb,
                min_arr=min_arr, forced_arr=forced_arr,
                ucache=ucache, ulogits=ulogits,
            )
            for i in range(nb):
                row = toks[i, : int(n_gen[i])]
                codes = row[(row >= base) & (row < base + AUDIO_CODEBOOK_SIZE)] - base
                candidates.append(codes.astype(np.int32))
            remaining -= nb
        code_ids = candidates[0]
        time_costs["lm_phase2_time_cost"] = time.perf_counter() - t0

        return LMResult(
            metadata=metadata,
            cot_text=cot_text,
            audio_codes=indices_to_codes(code_ids),
            code_indices=code_ids,
            time_costs=time_costs,
            candidates=candidates,
        )

    # -- phase-1 variants ----------------------------------------------------

    def _run_cot_free(
        self, caption, lyrics, key, *, temperature, top_p, top_k, cfg_scale,
        negative_prompt, max_cot_tokens,
    ) -> str:
        """Unconstrained CoT sampling (prefix-cached prompt prefill)."""
        prompt = build_formatted_prompt(caption, lyrics, generation_phase="cot")
        ids = self.tok.encode(prompt)
        sp = SamplingParams(
            temperature=temperature, top_p=top_p, top_k=top_k,
            max_new_tokens=max_cot_tokens,
            stop_tokens=(self.tok.think_end_id,),
            cfg_scale=cfg_scale,
        )
        total_len = len(self._bucket(ids)) + max_cot_tokens + 1
        cache, logits = self._prefill_state(ids, total_len, insert=True)
        ucache = ulogits = None
        if cfg_scale != 1.0:
            uncond = build_formatted_prompt(
                caption, lyrics, is_negative_prompt=True,
                generation_phase="cot", negative_prompt=negative_prompt,
            )
            uids = self.tok.encode(uncond)
            ucache, ulogits = self._prefill_state(
                uids, len(self._bucket(uids)) + max_cot_tokens + 1
            )
        toks, n_gen = self._decode_batch(
            cache, logits, sp, key, 1, ucache=ucache, ulogits=ulogits
        )
        row = [int(t) for t in toks[0, : int(n_gen[0])] if t >= 0]
        cot_body = self.tok.decode([t for t in row if t != self.tok.think_end_id])
        cot_text = f"<think>\n{cot_body}".rstrip()
        if not cot_text.endswith("</think>"):
            cot_text += "\n</think>"
        return cot_text

    def _run_cot_fsm(
        self, caption, lyrics, user_metadata, key, *, temperature, max_cot_tokens,
    ) -> str:
        """FSM-constrained CoT: field order + value grammars enforced during
        generation, with user metadata injected as forced text
        (constrained_logits_processor.py:425 user injection)."""
        from acestep_tpu.constrained import FSMConfig, MetadataFSM

        prompt = build_formatted_prompt(caption, lyrics, generation_phase="cot")
        ids = self.tok.encode(prompt)
        vocab_strs = self.vocab_strs()
        # on-device DFA path (default; the host-stepped FSM costs one ~30 ms
        # round-trip per token through the dev tunnel): compiled per
        # (vocab, genres, user-metadata) and cached; any compile overflow
        # (huge genres vocab) falls back to the host path below
        if self.tp_ctx is None and os.environ.get(
                "ACESTEP_TPU_DEVICE_FSM", "1") != "0":
            dfa = self._compiled_dfa(vocab_strs, user_metadata)
            if dfa is not None:
                out_ids, text = lm_serving.generate_with_fsm_device(
                    self.params, self.cfg, ids, dfa, vocab_strs, key,
                    temperature=temperature, max_new_tokens=max_cot_tokens,
                )
                return f"<think>\n{text.strip()}\n</think>"
        fsm = MetadataFSM(FSMConfig(), user_metadata=user_metadata or {})
        fsm_kw = {}
        if self.tp_ctx is not None:
            fsm_kw = dict(prefill_fn=self.tp_ctx.prefill,
                          decode_fn=self.tp_ctx.decode_step)
        out_ids, text = lm_serving.generate_with_fsm(
            self.params, self.cfg, ids, fsm, vocab_strs, key,
            temperature=temperature, max_new_tokens=max_cot_tokens, **fsm_kw,
        )
        body = text.strip()
        return f"<think>\n{body}\n</think>"

    def _compiled_dfa(self, vocab_strs, user_metadata):
        """Cached compile_dfa keyed by (vocab, genres content, user metadata);
        returns None when the machine exceeds the budget (host fallback)."""
        from acestep_tpu.constrained import (DFACompileError, FSMConfig,
                                             compile_dfa)

        cfg = FSMConfig()
        key = (
            id(vocab_strs), len(vocab_strs),
            hash(tuple(cfg.genres_vocab)),
            tuple(sorted((k, str(v)) for k, v in (user_metadata or {}).items())),
        )
        cache = getattr(self, "_dfa_cache", None)
        if cache is None:
            cache = self._dfa_cache = {}
        if key in cache:
            return cache[key]
        try:
            dfa = compile_dfa(vocab_strs, cfg, user_metadata=user_metadata or {})
        except DFACompileError as e:
            import warnings

            warnings.warn(f"device FSM unavailable ({e}); using host FSM",
                          stacklevel=2)
            dfa = None
        if len(cache) > 16:
            cache.clear()
        cache[key] = dfa
        return dfa

    def vocab_strs(self) -> List[str]:
        """Token id -> string piece for the whole vocab (FSM masking)."""
        if getattr(self, "_vocab_strs", None) is None:
            tok = self.tok
            if hasattr(tok, "vocab_strs"):
                self._vocab_strs = tok.vocab_strs()
            else:
                self._vocab_strs = [
                    tok.decode([i]) for i in range(self.cfg.vocab_size)
                ]
        return self._vocab_strs

    def understand_audio_from_codes(
        self, audio_codes: str, *, temperature: float = 0.7, top_p: float = 0.95,
        max_tokens: int = 1024, seed: int = 0,
    ) -> Dict[str, Any]:
        """Understanding flow: codes -> metadata/lyrics (llm_inference.py:1583+)."""
        prompt = build_understanding_prompt(audio_codes)
        sp = SamplingParams(
            temperature=temperature, top_p=top_p, max_new_tokens=max_tokens,
            stop_tokens=(self.tok.eos_token_id,),
        )
        toks, _ = self._run(prompt, sp, jax.random.key(seed))
        text = self.tok.decode(toks)
        metadata, _ = parse_lm_output(text)
        metadata["raw_output"] = text
        return metadata

    def create_sample_from_query(
        self, query: str, *, temperature: float = 0.85, top_p: float = 0.95,
        max_tokens: int = 768, seed: int = 0,
    ) -> Dict[str, Any]:
        """Inspiration flow: free-text query -> structured sample (llm_inference.py:1775+)."""
        prompt = build_sample_prompt(query, DEFAULT_LM_INSPIRED_INSTRUCTION)
        sp = SamplingParams(
            temperature=temperature, top_p=top_p, max_new_tokens=max_tokens,
            stop_tokens=(self.tok.eos_token_id,),
        )
        toks, _ = self._run(prompt, sp, jax.random.key(seed))
        text = self.tok.decode(toks)
        metadata, _ = parse_lm_output(text)
        metadata["raw_output"] = text
        return metadata

    def format_sample_from_input(
        self, text: str, *, temperature: float = 0.3, top_p: float = 0.9,
        max_tokens: int = 768, seed: int = 0,
    ) -> Dict[str, Any]:
        """Rewrite flow: messy input -> formatted sample (llm_inference.py:1949+)."""
        prompt = build_sample_prompt(text, DEFAULT_LM_REWRITE_INSTRUCTION)
        sp = SamplingParams(
            temperature=temperature, top_p=top_p, max_new_tokens=max_tokens,
            stop_tokens=(self.tok.eos_token_id,),
        )
        toks, _ = self._run(prompt, sp, jax.random.key(seed))
        out = self.tok.decode(toks)
        metadata, _ = parse_lm_output(out)
        metadata["raw_output"] = out
        return metadata
