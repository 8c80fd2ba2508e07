"""Oobleck VAE (Stable-Audio-style 48 kHz stereo codec) in functional JAX.

Behavioral reference: diffusers AutoencoderOobleck as re-implemented in
acestep/mlx_vae/model.py (Snake :24-60, residual units :62-88, blocks :94-142,
encoder/decoder :149-230) and acestep_ggml/cpp/acestep_vae_model.cpp
(weight-norm folding :520-589, Snake :682-692, conv padding emulation :694-722,
decode :957-1002, encode-mean :1004-1043).

Precision: the reference keeps the VAE out of fp16 because the Snake/ConvTranspose
chain audibly degrades (handler.py:189-210, _get_vae_dtype handler.py:1388).
Everything here computes in float32.

Layouts: activations are NLC ``[B, L, C]``; conv kernels are stored in lax layout
``[k, C_in, C_out]`` (torch Conv1d ``[out, in, k]`` -> transpose(2, 1, 0); torch
ConvTranspose1d ``[in, out, k]`` -> spatial-reversed transpose(2, 0, 1), see
converter).  Weight-norm is folded at conversion time.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import VAEConfig

Params = Dict[str, Any]

_DN = ("NWC", "WIO", "NWC")  # lhs [B, L, C], rhs [k, in, out]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv1d(
    x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
    *, stride: int = 1, padding: int = 0, dilation: int = 1,
) -> jax.Array:
    """torch.nn.Conv1d semantics on NLC input; w is [k, in, out]."""
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=((padding, padding),),
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(
    x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
    *, stride: int = 1, padding: int = 0,
) -> jax.Array:
    """torch.nn.ConvTranspose1d semantics; w is already spatially-reversed
    [k, in, out] (see module docstring).  out_len = (L-1)*stride - 2*pad + k.

    Dispatches to the subpixel formulation for stride > 1 (identical sums;
    avoids convolving over the ~(stride-1)/stride zeros that lhs_dilation
    inserts).  ``ACESTEP_TPU_CONVT_SUBPIXEL=0`` forces the dilated path."""
    import os as _os

    if stride > 1 and _os.environ.get("ACESTEP_TPU_CONVT_SUBPIXEL", "1") != "0":
        y = _conv_transpose1d_subpixel(x, w, stride=stride, padding=padding)
        if y is not None:
            if b is not None:
                y = y + b
            return y
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=((k - 1 - padding, k - 1 - padding),),
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
    )
    if b is not None:
        y = y + b
    return y


def _conv_transpose1d_subpixel(
    x: jax.Array, w: jax.Array, *, stride: int, padding: int,
) -> Optional[jax.Array]:
    """Phase-decomposed transposed conv: one dense stride-1 conv producing
    ``stride`` output phases as channels, then interleave.

    With xd = x dilated by s, the dilated path computes
        y[t] = sum_j xd[t + j - (k-1-p)] * w[j];
    only j ≡ (k-1-p) - t (mod s) hit non-zero taps, so each output phase
    b = t mod s is a plain correlation of x with the subsampled kernel
    w[j0(b)::s] at offset d(b).  Same products, same ascending-j order —
    bit-comparable up to XLA reduction-order noise, at ~1/s the MACs."""
    k, cin, cout = w.shape
    s, p = stride, padding
    c = k - 1 - p
    j0 = [(c - b) % s for b in range(s)]
    d = [(b + j0[b] - c) // s for b in range(s)]
    D = min(d)
    if D > 0:                       # never for k=2s, p=ceil(s/2); keep safe
        return None
    shift = [d[b] - D for b in range(s)]
    m_count = [(k - 1 - j0[b]) // s + 1 for b in range(s)]
    kk = max(m_count[b] + shift[b] for b in range(s))

    # static gather plan: jj[m', b] = tap into w, valid mask where in-range
    jj = np.zeros((kk, s), np.int32)
    valid = np.zeros((kk, s), bool)
    for b in range(s):
        for mp in range(kk):
            m = mp - shift[b]
            t = j0[b] + m * s
            if 0 <= m and 0 <= t < k:
                jj[mp, b] = t
                valid[mp, b] = True
    w2 = jnp.where(
        jnp.asarray(valid)[:, :, None, None],
        w[jnp.asarray(jj)],                       # [kk, s, cin, cout]
        jnp.zeros((), w.dtype),
    ).transpose(0, 2, 1, 3).reshape(kk, cin, s * cout)

    l = x.shape[1]
    out_len = (l - 1) * s - 2 * p + k
    a_count = -(-out_len // s)                     # ceil: phases per row
    pl = -D
    pr = max(0, a_count - 1 + kk - l - pl)
    y = jax.lax.conv_general_dilated(
        x, w2, window_strides=(1,), padding=((pl, pr),), dimension_numbers=_DN,
    )                                              # [B, a_count, s*cout]
    y = y[:, :a_count, :].reshape(x.shape[0], a_count, s, cout)
    return y.reshape(x.shape[0], a_count * s, cout)[:, :out_len, :]


def snake(x: jax.Array, alpha: jax.Array, beta: jax.Array, logscale: bool = True) -> jax.Array:
    """Snake activation x + sin^2(a*x)/b  (vae_model.cpp:682-692), f32 compute."""
    xf = x.astype(jnp.float32)
    a = jnp.exp(alpha.astype(jnp.float32)) if logscale else alpha.astype(jnp.float32)
    b = jnp.exp(beta.astype(jnp.float32)) if logscale else beta.astype(jnp.float32)
    y = xf + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(a * xf))
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_p(key, k, cin, cout, dtype, bias=True, scale=None):
    if scale is None:
        scale = 1.0 / math.sqrt(k * cin)
    p = {"w": (jax.random.normal(key, (k, cin, cout), jnp.float32) * scale).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _snake_p(c, dtype):
    return {"alpha": jnp.zeros((c,), dtype), "beta": jnp.zeros((c,), dtype)}


def _res_unit_p(key, dim, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "snake1": _snake_p(dim, dtype),
        "conv1": _conv_p(k1, 7, dim, dim, dtype),
        "snake2": _snake_p(dim, dtype),
        "conv2": _conv_p(k2, 1, dim, dim, dtype),
    }


def init_params(key: jax.Array, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    eh = cfg.encoder_hidden_size
    ch = cfg.decoder_channels
    cm = (1,) + tuple(cfg.channel_multiples)
    n = len(cfg.downsampling_ratios)
    keys = iter(jax.random.split(key, 4 + 8 * n * 2))

    enc_blocks = []
    for i, s in enumerate(cfg.downsampling_ratios):
        cin, cout = eh * cm[i], eh * cm[i + 1]
        enc_blocks.append({
            "res1": _res_unit_p(next(keys), cin, dtype),
            "res2": _res_unit_p(next(keys), cin, dtype),
            "res3": _res_unit_p(next(keys), cin, dtype),
            "snake1": _snake_p(cin, dtype),
            "conv1": _conv_p(next(keys), 2 * s, cin, cout, dtype),
        })

    dec_blocks = []
    strides = cfg.upsampling_ratios
    for i, s in enumerate(strides):
        cin = ch * cm[len(strides) - i]
        cout = ch * cm[len(strides) - i - 1]
        dec_blocks.append({
            "snake1": _snake_p(cin, dtype),
            "conv_t1": _conv_p(next(keys), 2 * s, cin, cout, dtype),
            "res1": _res_unit_p(next(keys), cout, dtype),
            "res2": _res_unit_p(next(keys), cout, dtype),
            "res3": _res_unit_p(next(keys), cout, dtype),
        })

    return {
        "encoder": {
            "conv1": _conv_p(next(keys), 7, cfg.audio_channels, eh, dtype),
            "blocks": enc_blocks,
            "snake1": _snake_p(eh * cm[-1], dtype),
            "conv2": _conv_p(next(keys), 3, eh * cm[-1], eh, dtype),
        },
        "decoder": {
            "conv1": _conv_p(next(keys), 7, cfg.decoder_input_channels, ch * cm[-1], dtype),
            "blocks": dec_blocks,
            "snake1": _snake_p(ch, dtype),
            "conv2": _conv_p(next(keys), 7, ch, cfg.audio_channels, dtype, bias=False),
        },
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _res_unit(p: Params, x: jax.Array, dilation: int) -> jax.Array:
    import os as _os

    _fused_flag = _os.environ.get("ACESTEP_TPU_VAE_FUSED", "auto")
    if _fused_flag != "0":
        # fused snake->dilated-conv->snake->1x1-conv->residual kernel
        # (ops/pallas/vae_resunit.py) for the bandwidth-bound late stages —
        # DEFAULT on TPU backends (measured 1.14x on the 120 s decode with
        # 43.6 dB agreement on worst-case random weights; docs/BENCHMARK.md
        # round-5 VAE study); "0" restores the XLA convs
        from acestep_tpu.ops.pallas import vae_resunit as _vru

        if (_vru.supported(x.shape[-1], jax.default_backend())
                and p["conv1"]["w"].shape[0] == 7
                and p["conv2"]["w"].shape[0] == 1
                and p["conv1"]["w"].shape[1] == p["conv1"]["w"].shape[2]):
            return _vru.fused_res_unit(p, x, dilation)
    pad = ((7 - 1) * dilation) // 2
    y = conv1d(snake(x, **p["snake1"]), p["conv1"]["w"], p["conv1"].get("b"),
               padding=pad, dilation=dilation)
    y = conv1d(snake(y, **p["snake2"]), p["conv2"]["w"], p["conv2"].get("b"))
    # safety trim (mlx_vae/model.py:82-86) — no-op with correct padding
    trim = (x.shape[1] - y.shape[1]) // 2
    if trim > 0:
        x = x[:, trim:-trim, :]
    return x + y



def _res_trio(blk: Params, x: jax.Array) -> jax.Array:
    """The per-block res-unit chain (dilations 1, 3, 9).  On TPU the whole
    trio runs as ONE fused kernel (one HBM read + one write for all three
    units, ops/pallas/vae_resunit.fused_res_trio) when the channel count
    supports it; otherwise unit-wise (each unit itself fused when eligible)."""
    import os as _os

    if _os.environ.get("ACESTEP_TPU_VAE_FUSED", "auto") != "0":
        from acestep_tpu.ops.pallas import vae_resunit as _vru

        units = (blk["res1"], blk["res2"], blk["res3"])
        if (_vru.trio_supported(x.shape[-1], jax.default_backend())
                and all(u["conv1"]["w"].shape[0] == 7
                        and u["conv2"]["w"].shape[0] == 1
                        and u["conv1"]["w"].shape[1] == u["conv1"]["w"].shape[2]
                        for u in units)):
            return _vru.fused_res_trio(units, x)
    x = _res_unit(blk["res1"], x, 1)
    x = _res_unit(blk["res2"], x, 3)
    return _res_unit(blk["res3"], x, 9)


def encode(params: Params, cfg: VAEConfig, audio: jax.Array) -> jax.Array:
    """audio [B, L, 2] -> posterior MEAN latents [B, L//hop, 64]
    (the C++ encode returns mean channels only, vae_model.cpp:1004-1043)."""
    p = params["encoder"]
    x = audio.astype(p["conv1"]["w"].dtype)
    x = conv1d(x, p["conv1"]["w"], p["conv1"].get("b"), padding=3)
    for blk, s in zip(p["blocks"], cfg.downsampling_ratios):
        x = _res_trio(blk, x)
        x = snake(x, **blk["snake1"])
        x = conv1d(x, blk["conv1"]["w"], blk["conv1"].get("b"),
                   stride=s, padding=math.ceil(s / 2))
    x = snake(x, **p["snake1"])
    x = conv1d(x, p["conv2"]["w"], p["conv2"].get("b"), padding=1)
    mean, _scale = jnp.split(x, 2, axis=-1)
    return mean.astype(jnp.float32)


def encode_and_sample(
    params: Params, cfg: VAEConfig, audio: jax.Array, key: jax.Array
) -> jax.Array:
    """Sample z ~ posterior (softplus std + 1e-4; mlx_vae/model.py:285-304)."""
    p = params["encoder"]
    x = audio.astype(jnp.float32)
    x = conv1d(x, p["conv1"]["w"], p["conv1"].get("b"), padding=3)
    for blk, s in zip(p["blocks"], cfg.downsampling_ratios):
        x = _res_trio(blk, x)
        x = snake(x, **blk["snake1"])
        x = conv1d(x, blk["conv1"]["w"], blk["conv1"].get("b"),
                   stride=s, padding=math.ceil(s / 2))
    x = snake(x, **p["snake1"])
    x = conv1d(x, p["conv2"]["w"], p["conv2"].get("b"), padding=1)
    mean, scale = jnp.split(x, 2, axis=-1)
    std = jnp.where(scale > 20.0, scale, jnp.log1p(jnp.exp(jnp.minimum(scale, 20.0)))) + 1e-4
    return mean + std * jax.random.normal(key, mean.shape, jnp.float32)


def decode(params: Params, cfg: VAEConfig, latents: jax.Array) -> jax.Array:
    """latents [B, T, 64] -> audio [B, T*hop, 2].

    Compute dtype follows the param dtype (f32 by default; bf16 params run the
    convs in bf16 while Snake still computes in f32 internally — the reference's
    precision hazard was fp16's exp/range, not bf16's)."""
    p = params["decoder"]
    x = latents.astype(p["conv1"]["w"].dtype)
    x = conv1d(x, p["conv1"]["w"], p["conv1"].get("b"), padding=3)
    for blk, s in zip(p["blocks"], cfg.upsampling_ratios):
        x = snake(x, **blk["snake1"])
        x = conv_transpose1d(x, blk["conv_t1"]["w"], blk["conv_t1"].get("b"),
                             stride=s, padding=math.ceil(s / 2))
        x = _res_trio(blk, x)
    x = snake(x, **p["snake1"])
    x = conv1d(x, p["conv2"]["w"], None, padding=3)
    return x


# ---------------------------------------------------------------------------
# tiled decode / encode (overlap-discard; acestep_ggml.cpp:2114-2229,
# handler.py:2848-3060)
# ---------------------------------------------------------------------------

_jit_absmax = jax.jit(lambda x: jnp.max(jnp.abs(x.astype(jnp.float32))))
_jit_to_int16 = jax.jit(
    lambda x, s: jnp.clip(
        jnp.round(x.astype(jnp.float32) * s), -32768.0, 32767.0
    ).astype(jnp.int16)
)


def _host_fetch(supers) -> np.ndarray:
    """Fetch device audio pieces to host, int16-quantized at the global peak
    scale when ACESTEP_TPU_D2H_INT16 != 0 (the result is peak-normalized to
    16-bit WAV downstream, so nothing the output keeps is lost — and 4x fewer
    bytes cross d2h)."""
    import os as _os

    if _os.environ.get("ACESTEP_TPU_D2H_INT16", "1") != "0":
        peak = max(float(jax.device_get(_jit_absmax(s))) for s in supers)
        scale = np.float32(32767.0 / max(peak, 1e-12))
        parts = jax.device_get([_jit_to_int16(s, jnp.float32(scale)) for s in supers])
        return np.concatenate(parts, axis=1).astype(np.float32) / scale
    return np.concatenate(jax.device_get(supers), axis=1)

def tiled_decode(
    params: Params,
    cfg: VAEConfig,
    latents: jax.Array,              # [B, T, 64]
    chunk_frames: int = 128,
    overlap_frames: Optional[int] = None,
    decode_fn=None,
    max_window_batch: Optional[int] = None,
    host_assemble: bool = False,
) -> jax.Array:
    """Chunked decode with overlap-discard; window/overlap/trim semantics match
    the C++ runtime (acestep_ggml.cpp:2114-2229).  At most 3 distinct window
    sizes occur, so the jitted decode compiles at most 3 times per seq bucket."""
    b, t, c = latents.shape
    if decode_fn is None:
        # params must be jit ARGUMENTS, not closure constants: closed-over
        # weights get embedded in the HLO (100MB+ compile payloads)
        jitted = jax.jit(lambda p, lat: decode(p, cfg, lat))
        decode_fn = lambda lat: jitted(params, lat)

    import os as _os

    env_wb = _os.environ.get("ACESTEP_TPU_VAE_WINDOW_BATCH")
    try:
        MAX_WINDOW_BATCH = max(1, int(env_wb)) if env_wb else max(1, max_window_batch or 4)
    except ValueError:
        MAX_WINDOW_BATCH = 4

    def decode_batched(lat):
        """decode_fn with the batch dim bounded by MAX_WINDOW_BATCH — merged
        continuous-batching requests (b > 1) must not decode unbounded items
        per call (full-rate conv activations are ~6.3 MB/frame/item)."""
        if lat.shape[0] <= MAX_WINDOW_BATCH:
            return decode_fn(lat)
        # pad the final slice up to MAX_WINDOW_BATCH so every call shares one
        # compiled shape (a raw remainder slice would cost an extra jit
        # compile per distinct (remainder, window-size) pair)
        n = lat.shape[0]
        parts = []
        for k in range(0, n, MAX_WINDOW_BATCH):
            piece = lat[k:k + MAX_WINDOW_BATCH]
            pad = MAX_WINDOW_BATCH - piece.shape[0]
            if pad > 0:
                piece = jnp.pad(piece, ((0, pad), (0, 0), (0, 0)))
            parts.append(decode_fn(piece))
        return jnp.concatenate(parts, axis=0)[:n]

    if chunk_frames <= 0 or chunk_frames >= t:
        if host_assemble:
            return _host_fetch([decode_batched(latents)])
        return decode_batched(latents)

    # window plan (same bounds/trim semantics as the C++ loop)
    windows = _window_plan(t, chunk_frames, overlap_frames)

    # TPU-native: decode all SAME-SIZE windows as one batched call (the
    # reference loops per window / per sample; batching the interior windows
    # turns N dispatches into ~2 and fills the chip)
    hop = cfg.hop_length
    from collections import defaultdict

    by_size = defaultdict(list)
    for idx, (cs, ce, ws, we) in enumerate(windows):
        by_size[we - ws].append(idx)

    # the stacked-window batch cap (MAX_WINDOW_BATCH above): full-rate conv
    # activations are ~0.4 GB per 128-frame window, so a small per-call window
    # batch bounds peak HBM while still amortizing dispatches (a 600 s song
    # has ~230 windows); ACESTEP_TPU_VAE_WINDOW_BATCH overrides

    # host_assemble: trim on device, concatenate into ~48-window SUPERPIECES
    # and fetch those few large buffers — avoids both the full-length device
    # concat (the ~0.7 GB OOM margin at 600 s) and hundreds of per-window
    # host round-trips (tunnel RTT dominates small transfers)
    import numpy as _np

    fetch = lambda x: x

    decoded: dict = {}
    for size, idxs in by_size.items():
        stackable = len(idxs) > 1 and b == 1
        if stackable:
            for g0 in range(0, len(idxs), MAX_WINDOW_BATCH):
                group = idxs[g0:g0 + MAX_WINDOW_BATCH]
                stacked = jnp.concatenate(
                    [latents[:, windows[i][2]:windows[i][3], :] for i in group], axis=0
                )
                # bucket the window count so the jitted decode compiles once per
                # (bucket, size) instead of once per song length
                n_win = stacked.shape[0]
                bucket = 1
                while bucket < n_win:
                    bucket *= 2
                if bucket > n_win:
                    stacked = jnp.pad(stacked, ((0, bucket - n_win), (0, 0), (0, 0)))
                audio = fetch(decode_fn(stacked))          # [bucket, size*hop, C]
                for j, i in enumerate(group):
                    decoded[i] = audio[j:j + 1]
        else:
            for i in idxs:
                ws, we = windows[i][2], windows[i][3]
                decoded[i] = fetch(decode_batched(latents[:, ws:we, :]))

    pieces = []
    upsample = None
    for i, (core_start, core_end, win_start, win_end) in enumerate(windows):
        audio = decoded[i]
        win_frames = win_end - win_start
        if upsample is None:
            upsample = audio.shape[1] / win_frames
        trim_start = int(round((core_start - win_start) * upsample))
        trim_end = int(round((win_end - core_end) * upsample))
        end = audio.shape[1] - trim_end
        pieces.append(audio[:, trim_start:end, :])
    if not host_assemble:
        return jnp.concatenate(pieces, axis=1)
    SUPER = 48
    supers = [
        jnp.concatenate(pieces[s0:s0 + SUPER], axis=1)
        for s0 in range(0, len(pieces), SUPER)
    ]
    return _host_fetch(supers)


def _decode_window_groups(params, cfg, latents, windows, max_window_batch: int,
                          mesh=None):
    """Decode + trim every window; returns the ordered pieces (device arrays).

    Windows are grouped by (size, trim) signature and every (batch item,
    window) pair runs through ``lax.map(batch_size=max_window_batch)`` so the
    decode body compiles ONCE per signature, executes in bounded-HBM groups,
    and XLA reuses activation buffers across iterations.  The map axis is the
    flattened item x window product: a merged continuous-batching request
    (b > 1) must be bounded exactly like a long song's window stack —
    full-rate conv activations are ~6.3 MB per latent frame per item, so an
    unbounded b=4 512-frame window decode holds ~13 GB of temps (the configs[3]
    cross-bucket OOM).

    With a ``mesh``, the window batch is additionally SHARDED across every
    mesh device (dp and tp axes alike — overlap-discard windows are
    embarrassingly data-parallel, unlike the TP'd DiT): each group pads its
    stack to a multiple of the device count, constrains the batch axis over
    the flattened mesh, and decodes ``max_window_batch`` windows PER DEVICE
    per call.  The reference decodes tiles strictly serially even on its
    biggest GPU (handler.py:2848 tiled_decode); this turns the decode's
    critical path into ~ceil(Nw / N_devices) window-times + one ICI
    all-gather of int16-bound audio."""
    from collections import defaultdict

    b = latents.shape[0]
    groups = defaultdict(list)
    for idx, (cs, ce, ws, we) in enumerate(windows):
        groups[(we - ws, cs - ws, we - ce)].append(idx)

    n_dev = int(mesh.devices.size) if mesh is not None else 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))

    decoded: dict = {}
    for (size, tf0, tf1), idxs in groups.items():
        stacked = jnp.concatenate(
            [latents[:, windows[i][2]:windows[i][3], :] for i in idxs],
            axis=0,
        )                                   # [Nw*B, size, C] (window-major)
        n = stacked.shape[0]
        if mesh is not None and n_dev > 1:
            # mesh path: decode wb windows per DEVICE per call; pad the final
            # (or only) group to a multiple of the device count so every
            # device holds an equal shard (padded windows decode silence and
            # are dropped below)
            wb = max(1, min(max_window_batch, -(-n // n_dev)))
            cap = wb * n_dev
            parts = []
            for g0 in range(0, n, cap):
                grp = stacked[g0:g0 + cap]
                pad = -grp.shape[0] % n_dev
                if pad:
                    grp = jnp.pad(grp, ((0, pad), (0, 0), (0, 0)))
                grp = jax.lax.with_sharding_constraint(grp, batch_sh)
                out = decode(params, cfg, grp)
                parts.append(out if pad == 0 else out[:grp.shape[0] - pad])
            audio = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        else:
            wb = max(1, min(max_window_batch, n))
            if n <= wb:
                audio = decode(params, cfg, stacked)
            else:
                audio = jax.lax.map(
                    lambda x: decode(params, cfg, x[None])[0],
                    stacked,
                    batch_size=wb,
                )                           # [Nw*B, size*ups, Cout]
        ups = audio.shape[1] / size
        t0, t1 = int(round(tf0 * ups)), int(round(tf1 * ups))
        trimmed = audio[:, t0:audio.shape[1] - t1, :]
        for j, i in enumerate(idxs):
            decoded[i] = trimmed[j * b:(j + 1) * b]
    return [decoded[i] for i in range(len(windows))]


@functools.partial(
    jax.jit, static_argnames=("cfg", "windows", "max_window_batch", "mesh"),
)
def fused_decode_windows_int16(
    params: Params,
    cfg: VAEConfig,
    latents: jax.Array,              # [1, T_seg, 64] (segment slice)
    windows: Tuple[Tuple[int, int, int, int], ...],   # SEGMENT-RELATIVE
    max_window_batch: int = 4,
    mesh=None,                       # jax.sharding.Mesh: shard windows across it
) -> Tuple[jax.Array, jax.Array]:
    """One SEGMENT of a segmented tiled decode: decode the given (relative)
    windows, trim, concat, and int16-quantize at this segment's own peak scale
    -> (i16 flat [L_seg*C], scale []).

    The segmented path (pipeline.generate) enqueues every segment
    asynchronously and then fetches them in order, so device→host transfer of
    segment g overlaps compute of segments g+1.. (measured 0.8 overlap factor
    through the dev tunnel; host-side reassembly is avoided by keeping the
    segments separate all the way into the WAV/FLAC writers — a 116 MB host
    concat costs ~2.8 s in this sandbox).  Windows are passed RELATIVE to the
    segment's latent slice so interior segments share one compiled program.

    Per-segment scales follow the same WAV-output semantics as
    ``fused_tiled_decode_int16``; the caller reconciles them to the global
    peak (scales only differ when some segment's peak exceeds 0.99)."""
    pieces = _decode_window_groups(params, cfg, latents, list(windows),
                                   max_window_batch, mesh=mesh)
    full = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
    full = full.astype(jnp.float32)
    if mesh is not None:
        # time-concat of window-sharded pieces: replicate before the global
        # peak reduction so the i16 payload is one addressable buffer (the
        # all-gather rides ICI and moves f32-audio-sized bytes once)
        from jax.sharding import NamedSharding, PartitionSpec as P

        full = jax.lax.with_sharding_constraint(full, NamedSharding(mesh, P()))
    peak = jnp.max(jnp.abs(full))
    scale = 32767.0 * jnp.where(peak > 0.99, 0.99 / jnp.maximum(peak, 1e-12), 1.0)
    i16 = jnp.clip(jnp.round(full * scale), -32768.0, 32767.0).astype(jnp.int16)
    return i16.reshape(-1), scale


def _window_plan(t: int, chunk_frames: int, overlap_frames: Optional[int]):
    """Static overlap-discard window plan (same semantics as tiled_decode)."""
    if overlap_frames is None:
        overlap_frames = min(64, max(1, chunk_frames // 4))
    if overlap_frames * 2 >= chunk_frames:
        overlap_frames = max(0, chunk_frames // 2 - 1)
    stride = chunk_frames - 2 * overlap_frames
    if stride <= 0:
        overlap_frames, stride = 0, chunk_frames
    windows = []
    for core_start in range(0, t, stride):
        core_end = min(core_start + stride, t)
        win_start = max(0, core_start - overlap_frames)
        win_end = min(t, core_end + overlap_frames)
        windows.append((core_start, core_end, win_start, win_end))
    return windows


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "chunk_frames", "overlap_frames",
                     "max_window_batch", "mesh"),
)
def fused_tiled_decode_int16(
    params: Params,
    cfg: VAEConfig,
    latents: jax.Array,              # [B, T, 64]
    chunk_frames: int = 512,
    overlap_frames: Optional[int] = None,
    max_window_batch: int = 4,
    mesh=None,                       # jax.sharding.Mesh: shard windows across it
) -> Tuple[jax.Array, jax.Array]:
    """The WHOLE tiled decode as one jitted program: window slicing, per-window
    decode, overlap trim, concat, global peak, and int16 quantization —
    returning (audio_i16 flat [B*L*C] in C-order, scale []).

    One device dispatch + one host fetch replace the per-window dispatch loop:
    through the dev tunnel each synced dispatch costs ~30 ms, which made the
    chunked loop (230 windows at 600 s) the dominant VAE-phase term.  Window
    semantics match tiled_decode/the C++ runtime (acestep_ggml.cpp:2114-2229);
    host side divides by ``scale`` to recover float audio at 16-bit-WAV
    precision (what the output keeps anyway).

    The int16 is quantized at the WAV output scale (peak-limited to 0.99 like
    audio_utils.py:24 peak normalization, i.e. ``32767·min(1, 0.99/peak)``), so
    the bytes ARE the final 16-bit PCM payload: WAV/FLAC writers consume them
    with no host-side float math (this sandbox page-faults large fresh host
    allocations at ~20 MB/s, so a 600 s int16→f32→int16 round-trip costs ~19 s).
    The FLAT return shape forces an unambiguous C-order device layout — the dev
    tunnel returns >1-D arrays F-contiguous, which turns every downstream numpy
    op into a strided copy.

    Peak HBM is bounded: same-(size, trim) window groups run through
    ``lax.map(batch_size=max_window_batch)``, so the decode body is compiled
    ONCE per group shape, executes sequentially in groups of at most
    ``max_window_batch`` windows (full-rate conv activations are ~2 GB per
    640-frame window — stacking all ~38 windows of a 600 s song would OOM),
    and XLA reuses the activation buffers across iterations."""
    b, t, c = latents.shape
    if chunk_frames >= t:
        # single-window fast path; still bound the per-call batch — a merged
        # continuous-batching request (b > 1) has the same full-rate
        # activation footprint per item as a window stack
        wb = max(1, min(max_window_batch, b))
        if b <= wb:
            pieces = [decode(params, cfg, latents)]
        else:
            pieces = [jax.lax.map(
                lambda x: decode(params, cfg, x[None])[0],
                latents, batch_size=wb)]
    else:
        windows = _window_plan(t, chunk_frames, overlap_frames)
        pieces = _decode_window_groups(params, cfg, latents, windows,
                                       max_window_batch, mesh=mesh)
    full = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
    full = full.astype(jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        full = jax.lax.with_sharding_constraint(full, NamedSharding(mesh, P()))
    peak = jnp.max(jnp.abs(full))
    # WAV output scale: attenuate to 0.99 full-scale only when the peak exceeds
    # it (audio_utils.py:24 semantics); quieter audio keeps its amplitude
    scale = 32767.0 * jnp.where(peak > 0.99, 0.99 / jnp.maximum(peak, 1e-12), 1.0)
    i16 = jnp.clip(jnp.round(full * scale), -32768.0, 32767.0).astype(jnp.int16)
    return i16.reshape(-1), scale


def tiled_encode(
    params: Params,
    cfg: VAEConfig,
    audio: jax.Array,               # [B, L, 2]
    chunk_frames: int = 64,
    overlap_frames: int = 16,
    encode_fn=None,
) -> jax.Array:
    """Chunked encode (latent-frame-aligned windows, overlap-discard)."""
    hop = cfg.hop_length
    b, l, c = audio.shape
    t = l // hop
    if encode_fn is None:
        jitted = jax.jit(lambda p, a: encode(p, cfg, a))
        encode_fn = lambda a: jitted(params, a)
    if chunk_frames <= 0 or chunk_frames >= t:
        return encode_fn(audio[:, : t * hop, :])

    if overlap_frames * 2 >= chunk_frames:
        overlap_frames = max(0, chunk_frames // 2 - 1)
    stride = chunk_frames - 2 * overlap_frames
    if stride <= 0:
        overlap_frames, stride = 0, chunk_frames

    pieces = []
    for core_start in range(0, t, stride):
        core_end = min(core_start + stride, t)
        win_start = max(0, core_start - overlap_frames)
        win_end = min(t, core_end + overlap_frames)
        lat = encode_fn(audio[:, win_start * hop:win_end * hop, :])
        trim_start = core_start - win_start
        trim_end = win_end - core_end
        end = lat.shape[1] - trim_end
        pieces.append(lat[:, trim_start:end, :])
    return jnp.concatenate(pieces, axis=1)


def silence_latents(
    params: Params, cfg: VAEConfig, n_frames: int, chunk_frames: int = 64
) -> jax.Array:
    """VAE-encode silence to build the src-latent context for text2music
    (acestep_ggml.cpp:1952-2040; chunked 64-frame encode)."""
    audio = jnp.zeros((1, n_frames * cfg.hop_length, cfg.audio_channels), jnp.float32)
    return tiled_encode(params, cfg, audio, chunk_frames=chunk_frames, overlap_frames=0)
