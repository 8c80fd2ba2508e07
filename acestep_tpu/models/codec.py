"""Audio-code <-> latent bridge: FSQ codebook + 5 Hz -> 25 Hz detokenizer.

The reference keeps this inside the DiT checkpoint's remote code and uses it in
both directions (SURVEY.md §2 tail):
  * LM codes -> 25 Hz latent hints: ``model.tokenizer.quantizer.
    get_output_from_indices`` + ``model.detokenizer`` (handler.py:906-939);
  * latents -> 5 Hz codes for understanding/remix: ``model.tokenize``
    (handler.py:1686-1741).

The checkpoint's exact detokenizer architecture is not published in the repo;
this module implements the documented interface (codebook 64000 at 5 Hz,
latent dim 64 at 25 Hz) with a finite-scalar-quantization codebook whose level
structure [8, 8, 8, 5, 5, 5] factorizes 64000, and a light conv upsampler.
Weights load from the converted checkpoint when the names match; until then the
bridge is structurally faithful and fully testable.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.constants import AUDIO_CODEBOOK_SIZE, CODES_PER_LATENT, LATENT_DIM
from acestep_tpu.models.vae import conv1d, conv_transpose1d

FSQ_LEVELS = (8, 8, 8, 5, 5, 5)          # prod = 64000 = codebook size
assert math.prod(FSQ_LEVELS) == AUDIO_CODEBOOK_SIZE


# ---------------------------------------------------------------------------
# FSQ codebook (deterministic, weight-free)
# ---------------------------------------------------------------------------

def indices_to_values(indices: jax.Array) -> jax.Array:
    """code index [..] -> FSQ values [.., len(levels)] in [-1, 1] (mixed-radix
    little-endian digits, dim 0 fastest)."""
    vals = []
    rem = indices.astype(jnp.int32)
    for l in FSQ_LEVELS:
        digit = rem % l
        rem = rem // l
        vals.append(2.0 * digit.astype(jnp.float32) / (l - 1) - 1.0)
    return jnp.stack(vals, axis=-1)


def values_to_indices(values: jax.Array) -> jax.Array:
    """FSQ values [.., D] (any reals) -> nearest code index [..]."""
    idx = jnp.zeros(values.shape[:-1], jnp.int32)
    mult = 1
    for i, l in enumerate(FSQ_LEVELS):
        digit = jnp.clip(
            jnp.round((values[..., i] + 1.0) * (l - 1) / 2.0), 0, l - 1
        ).astype(jnp.int32)
        idx = idx + digit * mult
        mult *= l
    return idx


# ---------------------------------------------------------------------------
# detokenizer (5 Hz code values -> 25 Hz latents) and tokenizer (inverse)
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, hidden: int = 512, dtype=jnp.float32,
                latent_dim: int = None) -> Dict[str, Any]:
    """``latent_dim`` overrides the 64-channel default (tiny test VAEs)."""
    ks = jax.random.split(key, 6)
    d = len(FSQ_LEVELS)
    ld = latent_dim if latent_dim is not None else LATENT_DIM

    def conv_p(k, kw, cin, cout):
        scale = 1.0 / math.sqrt(kw * cin)
        return {
            "w": (jax.random.normal(k, (kw, cin, cout), jnp.float32) * scale).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    return {
        "proj_in": conv_p(ks[0], 1, d, hidden),
        "up": conv_p(ks[1], 3 * CODES_PER_LATENT, hidden, hidden),   # convT stride 5, k=3s p=s -> exact x5
        "res1": conv_p(ks[2], 3, hidden, hidden),
        "res2": conv_p(ks[3], 3, hidden, hidden),
        "proj_out": conv_p(ks[4], 1, hidden, ld),
        # tokenizer direction: 25 Hz latents -> 5 Hz code values
        "down": conv_p(ks[5], 3 * CODES_PER_LATENT, ld, hidden),
        "tok_out": {"w": (jax.random.normal(jax.random.split(ks[5])[0],
                                            (1, hidden, d), jnp.float32) * 0.05).astype(dtype),
                    "b": jnp.zeros((d,), dtype)},
    }


def init_arch_params(arch: str, key: jax.Array, hidden: int = 256,
                     dtype=jnp.float32, latent_dim: Optional[int] = None
                     ) -> Dict[str, Any]:
    """Random-init params for any registered arch (tests / synthesized
    checkpoints).  conv_v1 keeps its legacy flat layout."""
    d = len(FSQ_LEVELS)
    ld = latent_dim if latent_dim is not None else LATENT_DIM
    if arch == "conv_v1":
        return init_params(key, hidden=hidden, dtype=dtype, latent_dim=latent_dim)

    ks = jax.random.split(key, 6)

    def conv_p(k, kw, cin, cout):
        scale = 1.0 / math.sqrt(kw * cin)
        return {"w": (jax.random.normal(k, (kw, cin, cout), jnp.float32)
                      * scale).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    def lin_p(k, cin, cout):
        scale = 1.0 / math.sqrt(cin)
        return {"w": (jax.random.normal(k, (cin, cout), jnp.float32)
                      * scale).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    if arch == "fsq_linear":
        tree = {
            "project_in": lin_p(ks[0], ld, d),
            "project_out": lin_p(ks[1], d, ld),
            "det0": conv_p(ks[2], 5, ld, hidden),
            "det2": conv_p(ks[3], 5, hidden, ld),
        }
    elif arch == "rfsq_conv":
        tree = {
            "project_in": lin_p(ks[0], ld, d),
            "project_out": lin_p(ks[1], d, ld),
            "up": conv_p(ks[2], 3 * CODES_PER_LATENT, ld, hidden),
            "post": conv_p(ks[3], 3, hidden, ld),
        }
    else:
        raise ValueError(f"unknown codec arch {arch!r}")
    return wrap_arch(arch, tree)


# ---------------------------------------------------------------------------
# checkpoint loading (converter probe / arch-override path)
# ---------------------------------------------------------------------------
#
# The real checkpoint keeps tokenizer/detokenizer in remote code
# (handler.py:906-939 `model.tokenizer.quantizer` / `model.detokenizer`), so
# its exact tensor names are only observable from a concrete checkpoint.  The
# converter (tools/convert_checkpoint.py) probes the DiT safetensors for the
# codec families below, and loads weights through this spec — either under the
# canonical names, or renamed via a `codec.name_map` override block in the
# checkpoint dir's config.json.  Anything else fails LOUDLY with a name diff
# (no silent random weights).

# (param_path, canonical checkpoint name stem, torch layout kind)
#   conv    : Conv1d          [out, in, k] -> [k, in, out]
#   conv_t  : ConvTranspose1d [in, out, k] -> reversed [k, in, out]
#   linear  : Linear          [out, in]    -> [in, out]
CODEC_TENSOR_SPEC = (
    ("proj_in", "detokenizer.proj_in", "conv"),
    ("up", "detokenizer.up", "conv_t"),
    ("res1", "detokenizer.res1", "conv"),
    ("res2", "detokenizer.res2", "conv"),
    ("proj_out", "detokenizer.proj_out", "conv"),
    ("down", "tokenizer.down", "conv"),
    ("tok_out", "tokenizer.out", "conv"),
)

# -- candidate architecture specs (VERDICT r4 item 5) -----------------------
#
# The real checkpoint's quantizer follows the vector-quantize-pytorch API
# (`quantizer.get_output_from_indices`, `num_quantizers` attr —
# handler.py:912-934), which points at FSQ / ResidualFSQ with optional
# project_in/project_out linears; the detokenizer is a 5x upsampling conv
# stack ([1,T5,dim] -> [1,T25,dim], handler.py:936-939).  Each spec below is a
# LANDING ZONE: a real checkpoint whose tensors match one of them (directly or
# via a `codec.name_map` rename) loads with no new code.  `codec.arch` in the
# checkpoint's config.json pins a variant; otherwise load_from_checkpoint
# auto-detects the first spec whose tensors are all present.

# fsq_linear: plain FSQ quantizer with projection linears
# (vector-quantize-pytorch FSQ(levels, dim): project_in Linear(dim->len(levels)),
# project_out Linear(len(levels)->dim)); detokenizer = nearest-5x upsample +
# two k5 convs.
FSQ_LINEAR_SPEC = (
    ("project_in", "tokenizer.quantizer.project_in", "linear"),
    ("project_out", "tokenizer.quantizer.project_out", "linear"),
    ("det0", "detokenizer.net.0", "conv"),
    ("det2", "detokenizer.net.2", "conv"),
)

# rfsq_conv: ResidualFSQ with num_quantizers=1 (codes are ONE 64000-way
# stream, so a deeper residual stack would need composite indices the LM
# vocabulary doesn't carry) — layers.0 holds the FSQ projections; detokenizer
# = ConvTranspose1d 5x upsample + post conv.
RFSQ_CONV_SPEC = (
    ("project_in", "tokenizer.quantizer.layers.0.project_in", "linear"),
    ("project_out", "tokenizer.quantizer.layers.0.project_out", "linear"),
    ("up", "detokenizer.up.0", "conv_t"),
    ("post", "detokenizer.post.0", "conv"),
)

# safetensors name prefixes that mark codec-family tensors in a checkpoint
CODEC_NAME_MARKERS = ("tokenizer.", "detokenizer.", "model.tokenizer.",
                      "model.detokenizer.")

ARCH_SPECS = {
    "conv_v1": CODEC_TENSOR_SPEC,
    "fsq_linear": FSQ_LINEAR_SPEC,
    "rfsq_conv": RFSQ_CONV_SPEC,
}


def get_arch(params: Dict[str, Any]) -> Tuple[str, Dict[str, Any]]:
    """(arch name, arch param subtree).  New archs nest under an "arch:<name>"
    key; the legacy flat layout is conv_v1 (back-compat with converted
    checkpoints from earlier rounds)."""
    for k in params:
        if k.startswith("arch:"):
            return k[5:], params[k]
    return "conv_v1", params


def wrap_arch(arch: str, tree: Dict[str, Any]) -> Dict[str, Any]:
    return tree if arch == "conv_v1" else {f"arch:{arch}": tree}


class CodecMismatchError(RuntimeError):
    """Checkpoint carries codec tensors the spec cannot map — report the diff."""

    def __init__(self, missing, found, shape_errors):
        self.missing, self.found, self.shape_errors = missing, found, shape_errors
        lines = ["codec tensors present in checkpoint but not loadable:"]
        if missing:
            lines.append("  expected (missing): " + ", ".join(sorted(missing)))
        if found:
            lines.append("  found in checkpoint: " + ", ".join(sorted(found)[:40]))
        if shape_errors:
            lines += [f"  shape mismatch: {e}" for e in shape_errors]
        lines.append("  fix: pin a variant with a codec.arch override in the "
                     "checkpoint's config.json (available: "
                     + ", ".join(sorted(ARCH_SPECS)) + "), and/or add a "
                     "codec.name_map block mapping the checkpoint names onto "
                     "that arch's spec stems (models/codec.py ARCH_SPECS); or "
                     "pass --allow-random-codec to keep the structural bridge.")
        super().__init__("\n".join(lines))


def probe_tensor_names(names) -> list:
    """Subset of checkpoint tensor names that belong to the codec families
    (tokenizer/detokenizer/quantizer — handler.py:906-939 attribute naming)."""
    out = []
    for n in names:
        if n.startswith(CODEC_NAME_MARKERS) or ".quantizer." in n or \
                n.startswith("quantizer."):
            out.append(n)
    return sorted(out)


def _torch_to_ours(w: np.ndarray, kind: str):
    """torch tensor layout -> our layout (None + reason on rank mismatch)."""
    if kind == "linear":
        if w.ndim != 2:
            return None, f"expected 2-d linear weight, got {w.shape}"
        return w.T.copy(), None                       # [out,in] -> [in,out]
    if w.ndim != 3:
        return None, f"expected 3-d conv weight, got {w.shape}"
    if kind == "conv_t":
        return w.transpose(2, 0, 1)[::-1].copy(), None  # [in,out,k] -> rev [k,in,out]
    return w.transpose(2, 1, 0).copy(), None            # [out,in,k] -> [k,in,out]


def _ours_to_torch(w: np.ndarray, kind: str) -> np.ndarray:
    """Inverse of _torch_to_ours (synthesized-checkpoint export for tests)."""
    if kind == "linear":
        return np.asarray(w).T.copy()
    if kind == "conv_t":
        return np.asarray(w)[::-1].transpose(1, 2, 0).copy()
    return np.asarray(w).transpose(2, 1, 0).copy()


def _load_spec(st, spec, name_map, names, dtype):
    """Load one arch spec; returns (params, missing, shape_errors)."""
    missing, shape_errors = [], []
    params: Dict[str, Any] = {}
    for path, stem, kind in spec:
        src = name_map.get(stem, stem)
        # tolerate a "model." prefix (remote-code modules hang off the model)
        cand = [src, "model." + src]
        w_name = next((c + ".weight" for c in cand if c + ".weight" in names), None)
        if w_name is None:
            missing.append(stem + ".weight")
            continue
        w = np.asarray(st.tensor(w_name, as_f32=True), np.float32)
        w, err = _torch_to_ours(w, kind)
        if err is not None:
            shape_errors.append(f"{w_name}: {err}")
            continue
        b_name = next((c + ".bias" for c in cand if c + ".bias" in names), None)
        b = (np.asarray(st.tensor(b_name, as_f32=True), np.float32) if b_name
             else np.zeros((w.shape[-1],), np.float32))
        params[path] = {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}
    return params, missing, shape_errors


def _sanity(arch: str, params: Dict[str, Any]):
    """Cross-tensor sanity checks per arch; returns list of error strings."""
    d = len(FSQ_LEVELS)
    errs = []
    if arch == "conv_v1":
        if params["proj_in"]["w"].shape[1] != d:
            errs.append(f"proj_in in-dim {params['proj_in']['w'].shape[1]} "
                        f"!= FSQ dim {d}")
        if params["up"]["w"].shape[0] % CODES_PER_LATENT != 0:
            errs.append(f"up kernel {params['up']['w'].shape[0]} not a multiple "
                        f"of x{CODES_PER_LATENT} upsample stride")
    else:
        if params["project_out"]["w"].shape[0] != d:
            errs.append(f"project_out in-dim {params['project_out']['w'].shape[0]} "
                        f"!= FSQ dim {d}")
        if params["project_in"]["w"].shape[1] != d:
            errs.append(f"project_in out-dim {params['project_in']['w'].shape[1]} "
                        f"!= FSQ dim {d}")
        if arch == "rfsq_conv" and params["up"]["w"].shape[0] % CODES_PER_LATENT != 0:
            errs.append(f"up kernel {params['up']['w'].shape[0]} not a multiple "
                        f"of x{CODES_PER_LATENT} upsample stride")
    return errs


def load_from_checkpoint(st, name_map: Optional[Dict[str, str]] = None,
                         arch: Optional[str] = None,
                         dtype=jnp.float32) -> Dict[str, Any]:
    """Build the codec param tree from a checkpoint's tensors.

    ``st`` is a SafetensorsFile-like object with .keys() and .tensor(name).
    ``name_map`` (the config.json `codec.name_map` override) maps spec stems
    (e.g. "detokenizer.up") to the checkpoint's actual name stems; ".weight" /
    ".bias" suffixes are appended per tensor.  ``arch`` (the config.json
    `codec.arch` override) pins one of ARCH_SPECS; when None, the first arch
    whose tensors are all present wins.  Raises CodecMismatchError when codec
    tensors exist but no arch maps them completely or shapes are invalid.
    """
    names = set(st.keys())
    present = probe_tensor_names(names)
    name_map = dict(name_map or {})

    if arch is not None:
        if arch not in ARCH_SPECS:
            raise CodecMismatchError(
                [], present,
                [f"unknown codec.arch {arch!r}; available: "
                 f"{', '.join(sorted(ARCH_SPECS))}"])
        tried = [arch]
    else:
        tried = list(ARCH_SPECS)

    per_arch_missing = {}
    for a in tried:
        params, missing, shape_errors = _load_spec(
            st, ARCH_SPECS[a], name_map, names, dtype)
        if not missing and not shape_errors:
            errs = _sanity(a, params)
            if errs:
                raise CodecMismatchError([], present, [f"[{a}] {e}" for e in errs])
            return wrap_arch(a, params)
        per_arch_missing[a] = (missing, shape_errors)

    detail = []
    for a, (missing, shape_errors) in per_arch_missing.items():
        if missing:
            detail.append(f"[{a}] missing: " + ", ".join(sorted(missing)[:10]))
        for e in shape_errors:
            detail.append(f"[{a}] {e}")
    raise CodecMismatchError(
        [m for ml, _ in per_arch_missing.values() for m in ml],
        present, detail)


def to_checkpoint_tensors(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Export a codec param tree as torch-layout checkpoint tensors under the
    arch's canonical names (synthesized-checkpoint path for conformance
    tests and the converter round-trip)."""
    arch, p = get_arch(params)
    out: Dict[str, np.ndarray] = {}
    for path, stem, kind in ARCH_SPECS[arch]:
        out[stem + ".weight"] = _ours_to_torch(p[path]["w"], kind)
        out[stem + ".bias"] = np.asarray(p[path]["b"], np.float32)
    return out


def _detok_conv_v1(p: Dict[str, Any], code_indices: jax.Array) -> jax.Array:
    v = indices_to_values(code_indices)                  # [B, T5, 6]
    x = conv1d(v, p["proj_in"]["w"], p["proj_in"]["b"])
    x = conv_transpose1d(
        jax.nn.gelu(x), p["up"]["w"], p["up"]["b"],
        stride=CODES_PER_LATENT, padding=CODES_PER_LATENT,
    )
    x = x + conv1d(jax.nn.gelu(x), p["res1"]["w"], p["res1"]["b"], padding=1)
    x = x + conv1d(jax.nn.gelu(x), p["res2"]["w"], p["res2"]["b"], padding=1)
    return conv1d(x, p["proj_out"]["w"], p["proj_out"]["b"])


def _tok_conv_v1(p: Dict[str, Any], latents: jax.Array) -> jax.Array:
    t25 = latents.shape[1]
    t5 = t25 // CODES_PER_LATENT
    x = latents[:, : t5 * CODES_PER_LATENT, :]
    x = conv1d(x, p["down"]["w"], p["down"]["b"],
               stride=CODES_PER_LATENT, padding=CODES_PER_LATENT)
    x = x[:, :t5, :]
    v = conv1d(jax.nn.gelu(x), p["tok_out"]["w"], p["tok_out"]["b"])
    return values_to_indices(jnp.tanh(v))


def _project_out_values(p: Dict[str, Any], code_indices: jax.Array) -> jax.Array:
    """indices -> FSQ values -> quantizer.project_out (the
    `get_output_from_indices` path, handler.py:932-934)."""
    v = indices_to_values(code_indices)                  # [B, T5, 6]
    return v @ p["project_out"]["w"] + p["project_out"]["b"]


def _pool_project_in(p: Dict[str, Any], latents: jax.Array) -> jax.Array:
    """latents 25 Hz -> mean-pool x5 -> quantizer.project_in -> bounded FSQ
    values -> nearest indices (the `model.tokenize` path, handler.py:1724-1733;
    FSQ bounds its pre-round values with tanh-like squashing)."""
    b, t25, ld = latents.shape
    t5 = t25 // CODES_PER_LATENT
    x = latents[:, : t5 * CODES_PER_LATENT, :].reshape(b, t5, CODES_PER_LATENT, ld)
    x = x.mean(axis=2)
    v = jnp.tanh(x @ p["project_in"]["w"] + p["project_in"]["b"])
    return values_to_indices(v)


def _detok_fsq_linear(p: Dict[str, Any], code_indices: jax.Array) -> jax.Array:
    x = _project_out_values(p, code_indices)             # [B, T5, ld]
    x = jnp.repeat(x, CODES_PER_LATENT, axis=1)          # nearest 5x upsample
    h = conv1d(x, p["det0"]["w"], p["det0"]["b"], padding=2)
    return conv1d(jax.nn.gelu(h), p["det2"]["w"], p["det2"]["b"], padding=2)


def _detok_rfsq_conv(p: Dict[str, Any], code_indices: jax.Array) -> jax.Array:
    x = _project_out_values(p, code_indices)             # [B, T5, ld]
    x = conv_transpose1d(x, p["up"]["w"], p["up"]["b"],
                         stride=CODES_PER_LATENT, padding=CODES_PER_LATENT)
    return conv1d(jax.nn.gelu(x), p["post"]["w"], p["post"]["b"], padding=1)


_ARCH_FWD = {
    "conv_v1": (_detok_conv_v1, _tok_conv_v1),
    "fsq_linear": (_detok_fsq_linear, _pool_project_in),
    "rfsq_conv": (_detok_rfsq_conv, _pool_project_in),
}


def detokenize(params: Dict[str, Any], code_indices: jax.Array) -> jax.Array:
    """[B, T5] code indices -> [B, T5*5, 64] latents (handler.py:906-939 path).
    Dispatches on the param tree's arch (get_arch)."""
    arch, p = get_arch(params)
    return _ARCH_FWD[arch][0](p, code_indices)


def tokenize(params: Dict[str, Any], latents: jax.Array) -> jax.Array:
    """[B, T25, 64] latents -> [B, T25//5] code indices (handler.py:1724-1733
    path).  Dispatches on the param tree's arch (get_arch)."""
    arch, p = get_arch(params)
    return _ARCH_FWD[arch][1](p, latents)


def codes_to_latents(
    params: Dict[str, Any], code_indices: np.ndarray, target_frames: int
) -> jax.Array:
    """Decode LM codes to latent hints, padded/cropped to target_frames
    (handler.py detokenizer output handling :906-939)."""
    idx = jnp.asarray(code_indices, jnp.int32)
    if idx.ndim == 1:
        idx = idx[None, :]
    lat = detokenize(params, idx)
    t = lat.shape[1]
    if t < target_frames:
        lat = jnp.pad(lat, ((0, 0), (0, target_frames - t), (0, 0)))
    return lat[:, :target_frames, :]
