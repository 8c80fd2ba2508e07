"""Checkpoint loading tests: name mapping, weight-norm folding, layout repacks,
and the native converted-format round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu import loader
from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
from acestep_tpu.models import dit, qwen, vae
from acestep_tpu.quant import QuantTensor, quantize_tree


TINY_Q = QwenConfig(
    vocab_size=64, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, num_key_value_heads=2, intermediate_size=48, head_dim=16,
)


def _rand(shape, rng):
    return rng.standard_normal(shape).astype(np.float32) * 0.1


def _qwen_state_dict(cfg, rng):
    sd = {
        "model.embed_tokens.weight": _rand((cfg.vocab_size, cfg.hidden_size), rng),
        "model.norm.weight": np.ones(cfg.hidden_size, np.float32),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        h, hd = cfg.hidden_size, cfg.head_dim
        sd[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        sd[p + "self_attn.q_proj.weight"] = _rand((cfg.num_attention_heads * hd, h), rng)
        sd[p + "self_attn.k_proj.weight"] = _rand((cfg.num_key_value_heads * hd, h), rng)
        sd[p + "self_attn.v_proj.weight"] = _rand((cfg.num_key_value_heads * hd, h), rng)
        sd[p + "self_attn.o_proj.weight"] = _rand((h, cfg.num_attention_heads * hd), rng)
        sd[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        sd[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        sd[p + "mlp.gate_proj.weight"] = _rand((cfg.intermediate_size, h), rng)
        sd[p + "mlp.up_proj.weight"] = _rand((cfg.intermediate_size, h), rng)
        sd[p + "mlp.down_proj.weight"] = _rand((h, cfg.intermediate_size), rng)
    return sd


def test_load_qwen_from_state_dict():
    rng = np.random.default_rng(0)
    sd = _qwen_state_dict(TINY_Q, rng)
    params = loader.load_qwen(sd, TINY_Q, dtype=jnp.float32)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    out = qwen.forward(params, TINY_Q, ids)
    assert out.shape == (1, 4, 32)
    # kernel is the transpose of the torch weight
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["q_proj"]["kernel"]),
        sd["model.layers.0.self_attn.q_proj.weight"].T, atol=1e-6)


def test_weight_norm_fold_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    v = _rand((8, 4, 7), rng)
    g = np.abs(_rand((8,), rng)) + 0.5
    ours = loader._fold_weight_norm(v, g.copy())
    tv = torch.from_numpy(v)
    norm = tv.norm(dim=(1, 2), keepdim=True)
    ref = (tv * (torch.from_numpy(g).reshape(-1, 1, 1) / norm)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_vae_load_and_run():
    cfg = VAEConfig(
        audio_channels=2, encoder_hidden_size=8, decoder_channels=4,
        decoder_input_channels=4, downsampling_ratios=(2, 4), channel_multiples=(1, 2),
    )
    rng = np.random.default_rng(2)
    sd = {}

    def conv(prefix, cout, cin, k, bias=True, wn=True):
        if wn:
            sd[prefix + ".weight_v"] = _rand((cout, cin, k), rng)
            sd[prefix + ".weight_g"] = np.abs(_rand((cout,), rng)) + 0.5
        else:
            sd[prefix + ".weight"] = _rand((cout, cin, k), rng)
        if bias:
            sd[prefix + ".bias"] = _rand((cout,), rng)

    def convt(prefix, cin, cout, k):
        sd[prefix + ".weight_v"] = _rand((cin, cout, k), rng)
        sd[prefix + ".weight_g"] = np.abs(_rand((cin,), rng)) + 0.5
        sd[prefix + ".bias"] = _rand((cout,), rng)

    def snake(prefix, c):
        sd[prefix + ".alpha"] = _rand((1, c, 1), rng)
        sd[prefix + ".beta"] = _rand((1, c, 1), rng)

    def res(prefix, c):
        snake(prefix + ".snake1", c)
        conv(prefix + ".conv1", c, c, 7)
        snake(prefix + ".snake2", c)
        conv(prefix + ".conv2", c, c, 1)

    eh, ch = cfg.encoder_hidden_size, cfg.decoder_channels
    cm = (1,) + cfg.channel_multiples
    conv("encoder.conv1", eh, 2, 7)
    for i, s in enumerate(cfg.downsampling_ratios):
        p = f"encoder.block.{i}"
        res(p + ".res_unit1", eh * cm[i]); res(p + ".res_unit2", eh * cm[i]); res(p + ".res_unit3", eh * cm[i])
        snake(p + ".snake1", eh * cm[i])
        conv(p + ".conv1", eh * cm[i + 1], eh * cm[i], 2 * s)
    snake("encoder.snake1", eh * cm[-1])
    conv("encoder.conv2", eh, eh * cm[-1], 3)

    n = len(cfg.upsampling_ratios)
    conv("decoder.conv1", ch * cm[-1], cfg.decoder_input_channels, 7)
    for i, s in enumerate(cfg.upsampling_ratios):
        p = f"decoder.block.{i}"
        cin, cout = ch * cm[n - i], ch * cm[n - i - 1]
        snake(p + ".snake1", cin)
        convt(p + ".conv_t1", cin, cout, 2 * s)
        res(p + ".res_unit1", cout); res(p + ".res_unit2", cout); res(p + ".res_unit3", cout)
    snake("decoder.snake1", ch)
    conv("decoder.conv2", 2, ch, 7, bias=False)

    params = loader.load_vae(sd, cfg)
    lat = jnp.asarray(rng.standard_normal((1, 6, 4)), jnp.float32)
    audio = vae.decode(params, cfg, lat)
    assert audio.shape == (1, 6 * cfg.hop_length, 2)
    enc = vae.encode(params, cfg, audio)
    assert enc.shape == (1, 6, eh // 2)


def test_save_load_roundtrip(tmp_path):
    cfg = TINY_Q
    params = qwen.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    policy = lambda p, a: getattr(a, "ndim", 0) == 2 and p.endswith("kernel") and "embed" not in p and a.shape[0] % 32 == 0
    qparams = quantize_tree(params, "q8_0", policy=policy)
    path = str(tmp_path / "model")
    loader.save_params(path, qparams, {"model": "test"})
    loaded = loader.load_params(path)

    ids = jnp.asarray([[3, 1, 2]], jnp.int32)
    a = np.asarray(qwen.forward(qparams, cfg, ids), dtype=np.float32)
    b = np.asarray(qwen.forward(loaded, cfg, ids), dtype=np.float32)
    np.testing.assert_array_equal(a, b)
    # structure preserved
    assert isinstance(loaded["layers"], list) and len(loaded["layers"]) == 2
    assert isinstance(loaded["layers"][0]["q_proj"]["kernel"], QuantTensor)


def test_dit_patchify_repack_roundtrip():
    """Loader's conv->linear repack must satisfy the mapping verified against
    torch in test_dit.py (kernel = w.transpose(2,1,0).reshape)."""
    rng = np.random.default_rng(5)
    h, c, p = 16, 12, 2
    w = _rand((h, c, p), rng)
    kernel = w.transpose(2, 1, 0).reshape(p * c, h)
    # inverse mapping recovers w
    back = kernel.reshape(p, c, h).transpose(2, 1, 0)
    np.testing.assert_array_equal(back, w)
