"""Converter CI test on a reference-layout checkpoint stub.

Synthesizes safetensors files with the EXACT tensor names the reference C++
loaders read (acestep_ggml/cpp/acestep_dit_model.cpp:749-1060 name list,
qwen_model.cpp HF names, vae weight-norm v/g pairs per vae_model.cpp:520-589),
runs tools/convert_checkpoint.py end-to-end, loads the converted params, and
generates through the engine.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
from acestep_tpu.utils.safetensors_io import save_safetensors

DIT_CFG = dict(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16,
    in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
    sliding_window=4, text_hidden_dim=32,
    num_lyric_encoder_hidden_layers=1, num_timbre_encoder_hidden_layers=1,
    timbre_hidden_dim=8,
)
VAE_CFG = dict(
    audio_channels=2, encoder_hidden_size=16, decoder_channels=8,
    decoder_input_channels=8, downsampling_ratios=[2, 4, 4],
    channel_multiples=[1, 2, 4],
)
TEXT_CFG = dict(
    vocab_size=256, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, num_key_value_heads=2, intermediate_size=64,
    head_dim=16,
)


def _rng_t(rng, *shape):
    return (rng.standard_normal(shape) * 0.02).astype(np.float32)


def _attn_tensors(rng, p, q_in, kv_in, nh, nkv, hd):
    return {
        p + "q_proj.weight": _rng_t(rng, nh * hd, q_in),
        p + "k_proj.weight": _rng_t(rng, nkv * hd, kv_in),
        p + "v_proj.weight": _rng_t(rng, nkv * hd, kv_in),
        p + "o_proj.weight": _rng_t(rng, q_in, nh * hd),
        p + "q_norm.weight": np.ones(hd, np.float32),
        p + "k_norm.weight": np.ones(hd, np.float32),
    }


def _mlp_tensors(rng, p, h, inter):
    return {
        p + "gate_proj.weight": _rng_t(rng, inter, h),
        p + "up_proj.weight": _rng_t(rng, inter, h),
        p + "down_proj.weight": _rng_t(rng, h, inter),
    }


def _enc_layer(rng, p, h, nh, nkv, hd, inter):
    t = {
        p + "input_layernorm.weight": np.ones(h, np.float32),
        p + "post_attention_layernorm.weight": np.ones(h, np.float32),
    }
    t.update(_attn_tensors(rng, p + "self_attn.", h, h, nh, nkv, hd))
    t.update(_mlp_tensors(rng, p + "mlp.", h, inter))
    return t


def make_dit_checkpoint(rng, d):
    c = DIT_CFG
    h, hd = c["hidden_size"], c["head_dim"]
    nh, nkv = c["num_attention_heads"], c["num_key_value_heads"]
    inter, patch = c["intermediate_size"], c["patch_size"]
    t = {
        # conv1d patchify [H, C_in, patch] / convT unpatchify [H, A, patch]
        "decoder.proj_in.1.weight": _rng_t(rng, h, c["in_channels"], patch),
        "decoder.proj_in.1.bias": np.zeros(h, np.float32),
        "decoder.proj_out.1.weight": _rng_t(rng, h, c["audio_acoustic_hidden_dim"], patch),
        "decoder.proj_out.1.bias": np.zeros(c["audio_acoustic_hidden_dim"], np.float32),
        "decoder.condition_embedder.weight": _rng_t(rng, h, h),
        "decoder.condition_embedder.bias": np.zeros(h, np.float32),
        "decoder.norm_out.weight": np.ones(h, np.float32),
        "decoder.scale_shift_table": _rng_t(rng, 1, 2, h),
        "encoder.text_projector.weight": _rng_t(rng, h, c["text_hidden_dim"]),
        "encoder.lyric_encoder.embed_tokens.weight": _rng_t(rng, h, c["text_hidden_dim"]),
        "encoder.lyric_encoder.embed_tokens.bias": np.zeros(h, np.float32),
        "encoder.lyric_encoder.norm.weight": np.ones(h, np.float32),
        "encoder.timbre_encoder.embed_tokens.weight": _rng_t(rng, h, c["timbre_hidden_dim"]),
        "encoder.timbre_encoder.embed_tokens.bias": np.zeros(h, np.float32),
        "encoder.timbre_encoder.norm.weight": np.ones(h, np.float32),
        "encoder.timbre_encoder.special_token": _rng_t(rng, 1, 1, h),
    }
    for te in ("decoder.time_embed.", "decoder.time_embed_r."):
        t[te + "linear_1.weight"] = _rng_t(rng, h, 256)
        t[te + "linear_1.bias"] = np.zeros(h, np.float32)
        t[te + "linear_2.weight"] = _rng_t(rng, h, h)
        t[te + "linear_2.bias"] = np.zeros(h, np.float32)
        t[te + "time_proj.weight"] = _rng_t(rng, h * 6, h)
        t[te + "time_proj.bias"] = np.zeros(h * 6, np.float32)
    for i in range(c["num_hidden_layers"]):
        p = f"decoder.layers.{i}."
        t[p + "self_attn_norm.weight"] = np.ones(h, np.float32)
        t[p + "cross_attn_norm.weight"] = np.ones(h, np.float32)
        t[p + "mlp_norm.weight"] = np.ones(h, np.float32)
        t[p + "scale_shift_table"] = _rng_t(rng, 1, 6, h)
        t.update(_attn_tensors(rng, p + "self_attn.", h, h, nh, nkv, hd))
        t.update(_attn_tensors(rng, p + "cross_attn.", h, h, nh, nkv, hd))
        t.update(_mlp_tensors(rng, p + "mlp.", h, inter))
    t.update(_enc_layer(rng, "encoder.lyric_encoder.layers.0.", h, nh, nkv, hd, inter))
    t.update(_enc_layer(rng, "encoder.timbre_encoder.layers.0.", h, nh, nkv, hd, inter))
    os.makedirs(d, exist_ok=True)
    save_safetensors(os.path.join(d, "model.safetensors"), t)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(DIT_CFG, f)


def _wn_conv(rng, t, prefix, cout, cin, k):
    t[prefix + ".weight_v"] = _rng_t(rng, cout, cin, k)
    t[prefix + ".weight_g"] = np.abs(_rng_t(rng, cout, 1, 1)) + 0.5
    t[prefix + ".bias"] = np.zeros(cout, np.float32)


def _res_unit(rng, t, prefix, dim):
    t[prefix + ".snake1.alpha"] = np.ones((1, dim, 1), np.float32)
    t[prefix + ".snake1.beta"] = np.ones((1, dim, 1), np.float32)
    _wn_conv(rng, t, prefix + ".conv1", dim, dim, 7)
    t[prefix + ".snake2.alpha"] = np.ones((1, dim, 1), np.float32)
    t[prefix + ".snake2.beta"] = np.ones((1, dim, 1), np.float32)
    _wn_conv(rng, t, prefix + ".conv2", dim, dim, 1)


def make_vae_checkpoint(rng, d):
    c = VAE_CFG
    eh, ch = c["encoder_hidden_size"], c["decoder_channels"]
    cm = [1] + list(c["channel_multiples"])
    t = {}
    _wn_conv(rng, t, "encoder.conv1", eh, c["audio_channels"], 7)
    for i, s in enumerate(c["downsampling_ratios"]):
        cin, cout = eh * cm[i], eh * cm[i + 1]
        p = f"encoder.block.{i}"
        for r in ("res_unit1", "res_unit2", "res_unit3"):
            _res_unit(rng, t, f"{p}.{r}", cin)
        t[p + ".snake1.alpha"] = np.ones((1, cin, 1), np.float32)
        t[p + ".snake1.beta"] = np.ones((1, cin, 1), np.float32)
        _wn_conv(rng, t, p + ".conv1", cout, cin, 2 * s)
    top = eh * cm[-1]
    t["encoder.snake1.alpha"] = np.ones((1, top, 1), np.float32)
    t["encoder.snake1.beta"] = np.ones((1, top, 1), np.float32)
    _wn_conv(rng, t, "encoder.conv2", eh, top, 3)

    strides = list(reversed(c["downsampling_ratios"]))
    dtop = ch * cm[-1]
    _wn_conv(rng, t, "decoder.conv1", dtop, c["decoder_input_channels"], 7)
    for i, s in enumerate(strides):
        cin = ch * cm[len(strides) - i]
        cout = ch * cm[len(strides) - i - 1]
        p = f"decoder.block.{i}"
        t[p + ".snake1.alpha"] = np.ones((1, cin, 1), np.float32)
        t[p + ".snake1.beta"] = np.ones((1, cin, 1), np.float32)
        # convtranspose1d torch layout [in, out, k]
        t[p + ".conv_t1.weight_v"] = _rng_t(rng, cin, cout, 2 * s)
        t[p + ".conv_t1.weight_g"] = np.abs(_rng_t(rng, cin, 1, 1)) + 0.5
        t[p + ".conv_t1.bias"] = np.zeros(cout, np.float32)
        for r in ("res_unit1", "res_unit2", "res_unit3"):
            _res_unit(rng, t, f"{p}.{r}", cout)
    t["decoder.snake1.alpha"] = np.ones((1, ch, 1), np.float32)
    t["decoder.snake1.beta"] = np.ones((1, ch, 1), np.float32)
    t["decoder.conv2.weight_v"] = _rng_t(rng, c["audio_channels"], ch, 7)
    t["decoder.conv2.weight_g"] = np.abs(_rng_t(rng, c["audio_channels"], 1, 1)) + 0.5
    os.makedirs(d, exist_ok=True)
    save_safetensors(os.path.join(d, "model.safetensors"), t)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(VAE_CFG, f)


def make_qwen_checkpoint(rng, d):
    c = TEXT_CFG
    h, hd = c["hidden_size"], c["head_dim"]
    nh, nkv, inter = (c["num_attention_heads"], c["num_key_value_heads"],
                      c["intermediate_size"])
    t = {"model.embed_tokens.weight": _rng_t(rng, c["vocab_size"], h),
         "model.norm.weight": np.ones(h, np.float32)}
    for i in range(c["num_hidden_layers"]):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        t.update(_attn_tensors(rng, p + "self_attn.", h, h, nh, nkv, hd))
        t.update(_mlp_tensors(rng, p + "mlp.", h, inter))
    os.makedirs(d, exist_ok=True)
    save_safetensors(os.path.join(d, "model.safetensors"), t)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(TEXT_CFG, f)


CODEC_HIDDEN, CODEC_LD = 8, 8


def _codec_tensors(rng, up_stem="detokenizer.up"):
    """Codec-family tensors in the reference's torch layouts (conv [out,in,k],
    convT [in,out,k]) under the canonical handler.py:906-939 name stems."""
    h, ld = CODEC_HIDDEN, CODEC_LD
    t = {
        "detokenizer.proj_in.weight": _rng_t(rng, h, 6, 1),
        "detokenizer.proj_in.bias": np.zeros(h, np.float32),
        up_stem + ".weight": _rng_t(rng, h, h, 15),       # convT [in, out, k=3*5]
        up_stem + ".bias": np.zeros(h, np.float32),
        "detokenizer.res1.weight": _rng_t(rng, h, h, 3),
        "detokenizer.res1.bias": np.zeros(h, np.float32),
        "detokenizer.res2.weight": _rng_t(rng, h, h, 3),
        "detokenizer.res2.bias": np.zeros(h, np.float32),
        "detokenizer.proj_out.weight": _rng_t(rng, ld, h, 1),
        "detokenizer.proj_out.bias": np.zeros(ld, np.float32),
        "tokenizer.down.weight": _rng_t(rng, h, ld, 15),
        "tokenizer.down.bias": np.zeros(h, np.float32),
        "tokenizer.out.weight": _rng_t(rng, 6, h, 1),
        "tokenizer.out.bias": np.zeros(6, np.float32),
    }
    return t


def _run_converter(repo, argv):
    return subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_checkpoint.py")]
        + argv,
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )


def test_converter_codec_probe_and_load(tmp_path):
    """DiT checkpoint carrying canonical codec tensors -> converted codec
    component loads, layouts transposed to [k, in, out], detokenize runs."""
    rng = np.random.default_rng(1)
    dit_dir, out_dir = str(tmp_path / "dit"), str(tmp_path / "converted")
    make_dit_checkpoint(rng, dit_dir)
    # append codec tensors to the same safetensors file (remote-code modules
    # live inside the DiT checkpoint in the reference)
    from acestep_tpu.utils.safetensors_io import SafetensorsFile
    st = SafetensorsFile(os.path.join(dit_dir, "model.safetensors"))
    t = {n: st.tensor(n) for n in st.keys()}
    t.update(_codec_tensors(rng))
    save_safetensors(os.path.join(dit_dir, "model.safetensors"), t)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = _run_converter(repo, ["--dit", dit_dir, "--out", out_dir,
                                 "--quant", "q8_0"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    manifest = json.loads(open(os.path.join(out_dir, "manifest.json")).read())
    assert manifest["components"]["codec"]["tensors"] == 14
    assert len(manifest["codec_probe"]) == 14

    from acestep_tpu import loader
    from acestep_tpu.models import codec as codec_mod

    p = loader.load_params(os.path.join(out_dir, "codec"))
    assert p["proj_in"]["w"].shape == (1, 6, CODEC_HIDDEN)
    assert p["up"]["w"].shape == (15, CODEC_HIDDEN, CODEC_HIDDEN)
    assert p["proj_out"]["w"].shape == (1, CODEC_HIDDEN, CODEC_LD)
    lat = codec_mod.detokenize(p, np.zeros((1, 10), np.int32))
    assert lat.shape == (1, 50, CODEC_LD)
    assert np.isfinite(np.asarray(lat)).all()
    # round-trip direction exists too
    codes = codec_mod.tokenize(p, np.asarray(lat))
    assert codes.shape == (1, 10)


def test_converter_codec_mismatch_fails_loudly(tmp_path):
    """Unmappable codec tensors abort the conversion with a name diff; the
    --allow-random-codec escape hatch records the mismatch in the manifest."""
    rng = np.random.default_rng(2)
    dit_dir, out_dir = str(tmp_path / "dit"), str(tmp_path / "converted")
    make_dit_checkpoint(rng, dit_dir)
    from acestep_tpu.utils.safetensors_io import SafetensorsFile
    st = SafetensorsFile(os.path.join(dit_dir, "model.safetensors"))
    t = {n: st.tensor(n) for n in st.keys()}
    # codec-family names the spec does NOT know (renamed upsampler)
    t["model.tokenizer.quantizer.project_in.weight"] = _rng_t(rng, 6, 6)
    t["detokenizer.upsampler.weight"] = _rng_t(rng, 8, 8, 15)
    save_safetensors(os.path.join(dit_dir, "model.safetensors"), t)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = _run_converter(repo, ["--dit", dit_dir, "--out", out_dir,
                                 "--quant", "q8_0"])
    assert proc.returncode != 0
    assert "detokenizer.proj_in.weight" in proc.stderr   # missing-name diff
    assert "codec.name_map" in proc.stderr               # actionable fix

    proc = _run_converter(repo, ["--dit", dit_dir, "--out", out_dir,
                                 "--quant", "q8_0", "--allow-random-codec"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    manifest = json.loads(open(os.path.join(out_dir, "manifest.json")).read())
    assert manifest["components"]["codec"]["status"] == "random"
    assert "mismatch" in manifest["components"]["codec"]


def test_converter_codec_name_map_override(tmp_path):
    """A codec.name_map block in the checkpoint's config.json maps renamed
    stems onto the spec (the arch-override path for real checkpoints)."""
    rng = np.random.default_rng(3)
    dit_dir, out_dir = str(tmp_path / "dit"), str(tmp_path / "converted")
    make_dit_checkpoint(rng, dit_dir)
    from acestep_tpu.utils.safetensors_io import SafetensorsFile
    st = SafetensorsFile(os.path.join(dit_dir, "model.safetensors"))
    t = {n: st.tensor(n) for n in st.keys()}
    t.update(_codec_tensors(rng, up_stem="detokenizer.upsampler"))
    save_safetensors(os.path.join(dit_dir, "model.safetensors"), t)
    cfg = json.loads(open(os.path.join(dit_dir, "config.json")).read())
    cfg["codec"] = {"name_map": {"detokenizer.up": "detokenizer.upsampler"}}
    with open(os.path.join(dit_dir, "config.json"), "w") as f:
        json.dump(cfg, f)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = _run_converter(repo, ["--dit", dit_dir, "--out", out_dir,
                                 "--quant", "q8_0"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    codec_cfg = json.loads(
        open(os.path.join(out_dir, "codec.config.json")).read())
    assert codec_cfg["name_map"] == {"detokenizer.up": "detokenizer.upsampler"}

    from acestep_tpu import loader
    p = loader.load_params(os.path.join(out_dir, "codec"))
    assert p["up"]["w"].shape == (15, CODEC_HIDDEN, CODEC_HIDDEN)


def test_converter_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    dit_dir, vae_dir, text_dir = (str(tmp_path / n) for n in ("dit", "vae", "text"))
    out_dir = str(tmp_path / "converted")
    make_dit_checkpoint(rng, dit_dir)
    make_vae_checkpoint(rng, vae_dir)
    make_qwen_checkpoint(rng, text_dir)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_checkpoint.py"),
         "--dit", dit_dir, "--vae", vae_dir, "--text", text_dir,
         "--out", out_dir, "--quant", "q8_0"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    manifest = json.loads(open(os.path.join(out_dir, "manifest.json")).read())
    assert set(manifest["components"]) == {"dit", "vae", "text_encoder"}

    # load the converted params and run the engine end-to-end
    from acestep_tpu import loader
    from acestep_tpu.pipeline import AceStepEngine, GenerationRequest

    dit_p = loader.load_params(os.path.join(out_dir, "dit"))
    vae_p = loader.load_params(os.path.join(out_dir, "vae"))
    text_p = loader.load_params(os.path.join(out_dir, "text_encoder"))
    engine = AceStepEngine(
        dit_p, DiTConfig.from_dict(DIT_CFG),
        vae_p, VAEConfig.from_dict(VAE_CFG),
        text_p, QwenConfig.from_dict(TEXT_CFG),
    )
    res = engine.generate(GenerationRequest(
        duration_s=10.0,
        style_token_ids=rng.integers(0, 256, (1, 6)),
        lyric_token_ids=rng.integers(0, 256, (1, 9)),
        refer_latents=rng.standard_normal((1, 1, 20, 8)).astype(np.float32),
        seeds=[0],
    ))
    assert np.isfinite(res.audio).all()
    assert res.audio.shape[1] == 250 * 32      # 10s at 25Hz-equivalent tiny hop


@pytest.mark.parametrize("arch", ["fsq_linear", "rfsq_conv"])
def test_converter_codec_arch_variants(tmp_path, arch):
    """Each candidate codec architecture (VERDICT r4 item 5) is a landing
    zone: a synthesized checkpoint in that arch's torch-layout tensor naming
    converts end-to-end WITHOUT overrides (auto-detect), and the converted
    params reproduce the source detokenizer bit-for-bit."""
    import jax

    from acestep_tpu.models import codec as codec_mod

    rng = np.random.default_rng(7)
    dit_dir = str(tmp_path / "dit")
    out_dir = str(tmp_path / "converted")
    make_dit_checkpoint(rng, dit_dir)

    src_params = codec_mod.init_arch_params(
        arch, jax.random.key(5), hidden=8, latent_dim=CODEC_LD)
    ckpt_tensors = codec_mod.to_checkpoint_tensors(src_params)

    from acestep_tpu.utils.safetensors_io import SafetensorsFile
    st = SafetensorsFile(os.path.join(dit_dir, "model.safetensors"))
    t = {n: st.tensor(n) for n in st.keys()}
    t.update(ckpt_tensors)
    save_safetensors(os.path.join(dit_dir, "model.safetensors"), t)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = _run_converter(repo, ["--dit", dit_dir, "--out", out_dir,
                                 "--quant", "q8_0"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    codec_cfg = json.loads(
        open(os.path.join(out_dir, "codec.config.json")).read())
    assert codec_cfg["arch"] == arch

    from acestep_tpu import loader
    p = loader.load_params(os.path.join(out_dir, "codec"))
    got_arch, _ = codec_mod.get_arch(p)
    assert got_arch == arch

    idx = np.asarray(rng.integers(0, 64000, (1, 10)), np.int32)
    lat_src = np.asarray(codec_mod.detokenize(src_params, idx))
    lat_conv = np.asarray(codec_mod.detokenize(p, idx))
    assert lat_src.shape == (1, 50, CODEC_LD)
    np.testing.assert_allclose(lat_conv, lat_src, rtol=1e-6, atol=1e-6)
    codes = codec_mod.tokenize(p, np.asarray(lat_conv))
    assert codes.shape == (1, 10)
    assert np.asarray(codes).min() >= 0 and np.asarray(codes).max() < 64000


def test_converter_codec_arch_pin_mismatch(tmp_path):
    """Pinning codec.arch to a variant the checkpoint does NOT match fails
    loudly and names the available archs."""
    import jax

    from acestep_tpu.models import codec as codec_mod

    rng = np.random.default_rng(8)
    dit_dir = str(tmp_path / "dit")
    out_dir = str(tmp_path / "converted")
    make_dit_checkpoint(rng, dit_dir)
    src_params = codec_mod.init_arch_params(
        "fsq_linear", jax.random.key(5), hidden=8, latent_dim=CODEC_LD)
    from acestep_tpu.utils.safetensors_io import SafetensorsFile
    st = SafetensorsFile(os.path.join(dit_dir, "model.safetensors"))
    t = {n: st.tensor(n) for n in st.keys()}
    t.update(codec_mod.to_checkpoint_tensors(src_params))
    save_safetensors(os.path.join(dit_dir, "model.safetensors"), t)
    cfg = json.loads(open(os.path.join(dit_dir, "config.json")).read())
    cfg["codec"] = {"arch": "rfsq_conv"}       # wrong pin
    with open(os.path.join(dit_dir, "config.json"), "w") as f:
        json.dump(cfg, f)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = _run_converter(repo, ["--dit", dit_dir, "--out", out_dir,
                                 "--quant", "q8_0"])
    assert proc.returncode != 0
    assert "rfsq_conv" in proc.stderr and "missing" in proc.stderr


def test_understand_audio_roundtrip_each_arch(tmp_path):
    """audio -> VAE encode -> codec tokenize -> codes -> detokenize latents
    works for every registered arch (the understand/cover-hint flow's codec
    legs, handler.py:1686-1741 + :906-939)."""
    import jax
    import jax.numpy as jnp

    from acestep_tpu.models import codec as codec_mod
    from acestep_tpu.training.dataset_builder import audio_to_codes
    from acestep_tpu.lm_pipeline import codes_to_indices
    import acestep_tpu.models.dit as dit_mod
    import acestep_tpu.models.vae as vae_mod
    import acestep_tpu.models.qwen as qwen_mod
    from acestep_tpu.pipeline import AceStepEngine
    from tests.test_pipeline import TINY_DIT, TINY_VAE, TINY_TEXT

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    engine = AceStepEngine(
        dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32), TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )
    sr = engine.vae_cfg.sampling_rate
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal((sr * 2, 2)) * 0.1).astype(np.float32)
    ld = engine.dit_cfg.audio_acoustic_hidden_dim

    for arch in codec_mod.ARCH_SPECS:
        params = codec_mod.init_arch_params(
            arch, jax.random.key(11), hidden=8, latent_dim=ld)
        code_str = audio_to_codes(engine, params, audio)
        idx = codes_to_indices(code_str)
        assert len(idx) >= 5
        lat = codec_mod.codes_to_latents(params, np.asarray(idx), 50)
        assert lat.shape == (1, 50, ld)
        assert np.isfinite(np.asarray(lat)).all()
