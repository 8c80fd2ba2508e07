"""Converter conformance against REAL torch-module checkpoints.

The layout fixtures in test_converter_e2e.py synthesize tensors by name; here
the checkpoints are produced by actual torch modules — `torch.nn.utils.
weight_norm`-wrapped convs for the VAE (genuine weight_g/weight_v
parametrization values, the layout the reference's pretrained Oobleck ships,
vae_model.cpp:520-589) and a transformers `Qwen3ForCausalLM` state_dict for
the LM (the exact on-disk naming of the HF/ModelScope checkpoints,
qwen_model.cpp HF name list) — then converted and compared FORWARD-vs-forward
against the torch module outputs.  This is the class of mismatch the name-only
fixtures cannot catch: a wrong fold, transpose, or padding convention that
still maps every name.
"""

import json
import math
import os
import subprocess
import sys
import warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

from acestep_tpu.config import QwenConfig, VAEConfig
from acestep_tpu.utils.safetensors_io import SafetensorsFile, save_safetensors

VAE_CFG = dict(
    audio_channels=2, encoder_hidden_size=16, decoder_channels=8,
    decoder_input_channels=8, downsampling_ratios=[2, 4, 4],
    channel_multiples=[1, 2, 4],
)


def _wn(m):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")          # deprecated-API warning only
        return torch.nn.utils.weight_norm(m)


class TorchSnake(torch.nn.Module):
    """Snake with (1, C, 1) log-scale params (mlx_vae/model.py:24-60)."""

    def __init__(self, c):
        super().__init__()
        self.alpha = torch.nn.Parameter(torch.randn(1, c, 1) * 0.2)
        self.beta = torch.nn.Parameter(torch.randn(1, c, 1) * 0.2)

    def forward(self, x):
        a, b = torch.exp(self.alpha), torch.exp(self.beta)
        return x + (1.0 / (b + 1e-9)) * torch.sin(a * x) ** 2


class TorchResUnit(torch.nn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        self.dilation = dilation
        self.snake1 = TorchSnake(dim)
        self.conv1 = _wn(torch.nn.Conv1d(dim, dim, 7, dilation=dilation,
                                         padding=(6 * dilation) // 2))
        self.snake2 = TorchSnake(dim)
        self.conv2 = _wn(torch.nn.Conv1d(dim, dim, 1))

    def forward(self, x):
        y = self.conv1(self.snake1(x))
        y = self.conv2(self.snake2(y))
        return x + y


class TorchEncBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.res_unit1 = TorchResUnit(cin, 1)
        self.res_unit2 = TorchResUnit(cin, 3)
        self.res_unit3 = TorchResUnit(cin, 9)
        self.snake1 = TorchSnake(cin)
        self.conv1 = _wn(torch.nn.Conv1d(cin, cout, 2 * stride, stride=stride,
                                         padding=math.ceil(stride / 2)))

    def forward(self, x):
        x = self.res_unit3(self.res_unit2(self.res_unit1(x)))
        return self.conv1(self.snake1(x))


class TorchDecBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.snake1 = TorchSnake(cin)
        self.conv_t1 = _wn(torch.nn.ConvTranspose1d(
            cin, cout, 2 * stride, stride=stride,
            padding=math.ceil(stride / 2)))
        self.res_unit1 = TorchResUnit(cout, 1)
        self.res_unit2 = TorchResUnit(cout, 3)
        self.res_unit3 = TorchResUnit(cout, 9)

    def forward(self, x):
        x = self.conv_t1(self.snake1(x))
        return self.res_unit3(self.res_unit2(self.res_unit1(x)))


class TorchOobleck(torch.nn.Module):
    """Reference-structured Oobleck VAE whose state_dict keys ARE the
    checkpoint names the loader maps (encoder.block.N.res_unitM..., weight-
    normed convs, decoder.conv_t1 transposed convs)."""

    def __init__(self, cfg: VAEConfig):
        super().__init__()
        eh, ch = cfg.encoder_hidden_size, cfg.decoder_channels
        cm = (1,) + tuple(cfg.channel_multiples)

        enc = torch.nn.Module()
        enc.conv1 = _wn(torch.nn.Conv1d(cfg.audio_channels, eh, 7, padding=3))
        enc.block = torch.nn.ModuleList([
            TorchEncBlock(eh * cm[i], eh * cm[i + 1], s)
            for i, s in enumerate(cfg.downsampling_ratios)])
        enc.snake1 = TorchSnake(eh * cm[-1])
        enc.conv2 = _wn(torch.nn.Conv1d(eh * cm[-1], eh, 3, padding=1))
        self.encoder = enc

        strides = list(cfg.upsampling_ratios)
        dec = torch.nn.Module()
        dec.conv1 = _wn(torch.nn.Conv1d(cfg.decoder_input_channels,
                                        ch * cm[-1], 7, padding=3))
        dec.block = torch.nn.ModuleList([
            TorchDecBlock(ch * cm[len(strides) - i],
                          ch * cm[len(strides) - i - 1], s)
            for i, s in enumerate(strides)])
        dec.snake1 = TorchSnake(ch)
        dec.conv2 = _wn(torch.nn.Conv1d(ch, cfg.audio_channels, 7, padding=3,
                                        bias=False))
        self.decoder = dec

    def encode_mean(self, audio_ncl):
        x = self.encoder.conv1(audio_ncl)
        for blk in self.encoder.block:
            x = blk(x)
        x = self.encoder.conv2(self.encoder.snake1(x))
        mean, _ = torch.chunk(x, 2, dim=1)
        return mean

    def decode(self, lat_ncl):
        x = self.decoder.conv1(lat_ncl)
        for blk in self.decoder.block:
            x = blk(x)
        return self.decoder.conv2(self.decoder.snake1(x))


def _save_torch_checkpoint(module, d, cfg_dict):
    os.makedirs(d, exist_ok=True)
    t = {k: v.detach().numpy().astype(np.float32)
         for k, v in module.state_dict().items()}
    save_safetensors(os.path.join(d, "model.safetensors"), t)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg_dict, f)
    return t


def _run_converter(argv):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_checkpoint.py")]
        + argv, capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})


@pytest.fixture(scope="module")
def torch_vae(tmp_path_factory):
    torch.manual_seed(0)
    cfg = VAEConfig.from_dict(VAE_CFG)
    m = TorchOobleck(cfg).eval()
    # make the weight-norm fold non-trivial: g != ||v|| after this
    with torch.no_grad():
        for name, p in m.named_parameters():
            if name.endswith("weight_g"):
                p.mul_(torch.rand_like(p) + 0.5)
    d = str(tmp_path_factory.mktemp("vae_ckpt"))
    _save_torch_checkpoint(m, d, VAE_CFG)
    out = str(tmp_path_factory.mktemp("vae_out"))
    proc = _run_converter(["--vae", d, "--out", out])
    assert proc.returncode == 0, proc.stderr[-2000:]
    from acestep_tpu import loader

    return m, cfg, loader.load_params(os.path.join(out, "vae")), d


def test_vae_decode_parity_vs_torch(torch_vae):
    """decode(): weight-norm fold + convT layout reversal + Snake + padding all
    reproduce the torch module through the real converter CLI."""
    from acestep_tpu.models import vae

    m, cfg, params, _ = torch_vae
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((2, 40, cfg.decoder_input_channels)).astype(np.float32)
    ours = np.asarray(vae.decode(params, cfg, lat))
    with torch.no_grad():
        ref = m.decode(torch.from_numpy(lat.transpose(0, 2, 1))).numpy()
    ref = ref.transpose(0, 2, 1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_vae_decode_parity_dilated_path(torch_vae, monkeypatch):
    """Same parity through the lhs-dilation convT formulation (the subpixel
    decomposition's fallback), pinning BOTH transposed-conv paths to torch."""
    from acestep_tpu.models import vae

    monkeypatch.setenv("ACESTEP_TPU_CONVT_SUBPIXEL", "0")
    m, cfg, params, _ = torch_vae
    rng = np.random.default_rng(1)
    lat = rng.standard_normal((1, 33, cfg.decoder_input_channels)).astype(np.float32)
    ours = np.asarray(vae.decode(params, cfg, lat))
    with torch.no_grad():
        ref = m.decode(torch.from_numpy(lat.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), atol=2e-4, rtol=1e-3)


def test_vae_encode_parity_vs_torch(torch_vae):
    from acestep_tpu.models import vae

    m, cfg, params, _ = torch_vae
    hop = int(np.prod(VAE_CFG["downsampling_ratios"]))
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal((1, hop * 25, cfg.audio_channels)) * 0.3
             ).astype(np.float32)
    ours = np.asarray(vae.encode(params, cfg, audio))
    with torch.no_grad():
        ref = m.encode_mean(torch.from_numpy(audio.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), atol=2e-4, rtol=1e-3)


def test_vae_missing_tensor_fails_loudly(torch_vae, tmp_path):
    """Dropping one weight_v from the checkpoint aborts the conversion and the
    error names the missing tensor (no silent random fill)."""
    m, cfg, _, src = torch_vae
    st = SafetensorsFile(os.path.join(src, "model.safetensors"))
    victim = "decoder.block.1.conv_t1.weight_v"
    t = {n: st.tensor(n) for n in st.keys() if n != victim}
    d = str(tmp_path / "broken")
    os.makedirs(d)
    save_safetensors(os.path.join(d, "model.safetensors"), t)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(VAE_CFG, f)
    proc = _run_converter(["--vae", d, "--out", str(tmp_path / "out")])
    assert proc.returncode != 0
    # the loader tries .weight_v then the un-normed .weight; either way the
    # abort names the conv stem it could not map
    assert "decoder.block.1.conv_t1" in proc.stderr + proc.stdout


# ---------------------------------------------------------------------------
# Qwen3: transformers state_dict -> converter -> forward parity
# ---------------------------------------------------------------------------

QWEN_SMALL = dict(
    vocab_size=512, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
    head_dim=16, rope_theta=1e6, tie_word_embeddings=False,
)


def _hf_qwen(cfg_d, tie):
    from transformers.models.qwen3 import Qwen3Config
    from transformers.models.qwen3.modeling_qwen3 import Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        **{k: v for k, v in cfg_d.items() if k != "tie_word_embeddings"},
        tie_word_embeddings=tie, attention_bias=False, use_cache=False,
        attn_implementation="eager")
    torch.manual_seed(3)
    m = Qwen3ForCausalLM(hf_cfg).eval().to(torch.float32)
    with torch.no_grad():                     # richer-than-init magnitudes
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return m


@pytest.fixture(scope="module")
def hf_lm(tmp_path_factory):
    m = _hf_qwen(QWEN_SMALL, tie=False)
    d = str(tmp_path_factory.mktemp("lm_ckpt"))
    # the on-disk HF layout: "model.layers.N....", "lm_head.weight"
    cfg_json = {**QWEN_SMALL, "architectures": ["Qwen3ForCausalLM"],
                "model_type": "qwen3", "torch_dtype": "float32"}
    _save_torch_checkpoint(m, d, cfg_json)
    return m, d


def test_qwen_loader_forward_parity_vs_hf(hf_lm):
    """load_qwen on a transformers state_dict (f32, no quant) reproduces the
    HF forward + lm_head logits."""
    import jax.numpy as jnp

    from acestep_tpu import loader
    from acestep_tpu.models import qwen

    m, d = hf_lm
    cfg = QwenConfig.from_dict(QWEN_SMALL)
    st = SafetensorsFile(os.path.join(d, "model.safetensors"))
    params = loader.load_qwen(st, cfg, quant=None, dtype=jnp.float32)
    assert "lm_head" in params                # untied head mapped

    rng = np.random.default_rng(5)
    ids = rng.integers(0, QWEN_SMALL["vocab_size"], (2, 13))
    hidden = qwen.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    ours = np.asarray(qwen.lm_logits(params, cfg, hidden))
    with torch.no_grad():
        theirs = m(input_ids=torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=2e-3)


def test_qwen_converter_cli_parity_vs_hf(hf_lm, tmp_path):
    """The full converter CLI (default q8_0) on the HF checkpoint: converted
    params load and match the torch logits to quantization tolerance, and the
    greedy argmax agrees."""
    import jax.numpy as jnp

    from acestep_tpu import loader
    from acestep_tpu.models import qwen

    m, d = hf_lm
    out = str(tmp_path / "out")
    proc = _run_converter(["--lm", d, "--out", out, "--quant", "q8_0"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    cfg = QwenConfig.from_dict(
        json.load(open(os.path.join(out, "lm.config.json"))))
    assert not cfg.tie_word_embeddings
    params = loader.load_params(os.path.join(out, "lm"))

    rng = np.random.default_rng(6)
    ids = rng.integers(0, QWEN_SMALL["vocab_size"], (1, 17))
    hidden = qwen.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    ours = np.asarray(qwen.lm_logits(params, cfg, hidden), np.float32)
    with torch.no_grad():
        theirs = m(input_ids=torch.from_numpy(ids)).logits.numpy()
    cos = float((ours.ravel() @ theirs.ravel())
                / (np.linalg.norm(ours) * np.linalg.norm(theirs) + 1e-12))
    assert cos > 0.999
    # greedy decode decisions must survive quantization at this scale
    assert (ours[0, -1].argmax() == theirs[0, -1].argmax())


def test_qwen_tied_embeddings_checkpoint(tmp_path):
    """A tied checkpoint (the 0.6B planner config) maps without lm_head and
    projects logits through the embedding matrix."""
    import jax.numpy as jnp

    from acestep_tpu import loader
    from acestep_tpu.models import qwen

    m = _hf_qwen(QWEN_SMALL, tie=True)
    d = str(tmp_path / "ckpt")
    cfg_d = {**QWEN_SMALL, "tie_word_embeddings": True}
    _save_torch_checkpoint(m, d, cfg_d)
    cfg = QwenConfig.from_dict(cfg_d)
    st = SafetensorsFile(os.path.join(d, "model.safetensors"))
    params = loader.load_qwen(st, cfg, quant=None, dtype=jnp.float32)
    assert "lm_head" not in params

    rng = np.random.default_rng(7)
    ids = rng.integers(0, QWEN_SMALL["vocab_size"], (1, 9))
    hidden = qwen.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    ours = np.asarray(qwen.lm_logits(params, cfg, hidden), np.float32)
    with torch.no_grad():
        theirs = m(input_ids=torch.from_numpy(ids)).logits.numpy()
    cos = float((ours.ravel() @ theirs.ravel())
                / (np.linalg.norm(ours) * np.linalg.norm(theirs) + 1e-12))
    assert cos > 0.999                        # bf16 matmul in the tied path
