"""External FLOP oracle: count the reference generator's MACs with torch
hooks and check the repo's analytic jaxpr counter against it.

The repo's MFU claims (bench.py `_mfu`, scripts/flops_analysis.py) rest on
an analytic per-frame FLOP walk. This script anchors that number to an
INDEPENDENT measurement: the reference PyTorch HILCodec generator
(/root/reference/models/hilcodec/models.py:24-125, speech config, n=8) run
on CPU with `torch.nn.functional.conv1d/conv_transpose1d/linear`
intercepted, counting 2*MACs exactly as executed. The VQ distance GEMMs
(`flatten @ embed`, /root/reference/models/hilcodec/vector_quantize.py:144-148)
go through Tensor.__matmul__ (not patchable), so they are added in closed
form — 8 stages x 2*T*dim*card ~ 0.16 GFLOP/audio-s, ~0.5% of the total.

Usage:  python scripts/flops_oracle.py        # prints both counts + ratio
The pytest wrapper (tests/test_flops_oracle.py) asserts they agree to 10%.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REFERENCE = "/root/reference"
SR = 24000
HOP = 320
N_Q = 8


def _shim_librosa():
    """The env has no librosa; the reference's functional/__init__ imports
    `librosa.filters.mel` at module scope (audio_functional.py:8). The
    generator forward never calls it, but the import must resolve — shim it
    with the repo's own slaney filterbank (ops/mel.py, parity-tested)."""
    import types
    if "librosa" in sys.modules:
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from hilcodec_tpu.ops.mel import mel_filterbank

    def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
        return np.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))

    lib = types.ModuleType("librosa")
    filters = types.ModuleType("librosa.filters")
    filters.mel = mel
    lib.filters = filters
    sys.modules["librosa"] = lib
    sys.modules["librosa.filters"] = filters
    # the package __init__ chain (models.hilcodec -> wrapper ->
    # discriminators/metrics) imports deps the env lacks; none are touched
    # by the generator forward — empty shims let the import resolve
    class _Any(types.ModuleType):
        def __getattr__(self, name):  # any symbol resolves to a dummy
            if name.startswith("__"):
                raise AttributeError(name)
            return type(name, (), {})

    for name in ("torchaudio", "torchaudio.transforms", "pesq", "pystoi",
                 "parselmouth", "soundfile"):
        if name not in sys.modules:
            sys.modules[name] = _Any(name)


def torch_reference_gflops_per_audio_s(seconds: float = 1.0) -> float:
    """2*MACs per audio-second of the reference generator forward
    (encoder -> RVQ(8) -> decoder), counted by intercepting the functional
    conv/linear entry points during a real forward pass."""
    sys.path.insert(0, REFERENCE)
    _shim_librosa()
    import torch
    import torch.nn.functional as TF
    import yaml

    with open(os.path.join(REFERENCE, "configs/hilcodec_speech.yaml")) as f:
        cfg = yaml.safe_load(f)
    kwargs = dict(cfg["model_kwargs"])
    # quantizer dropout is a training-time behavior; eval uses the full
    # stack (wrapper.py pesq_epoch passes n explicitly)
    kwargs.setdefault("vq_kwargs", {})["dropout"] = False

    from models.hilcodec.models import HILCodec

    model = HILCodec(sample_rate=SR, **kwargs)
    model.eval()

    flops = [0.0]
    orig = {"conv1d": TF.conv1d, "conv_transpose1d": TF.conv_transpose1d,
            "linear": TF.linear}

    def conv1d(x, w, *a, **k):
        out = orig["conv1d"](x, w, *a, **k)
        # w: [C_out, C_in/groups, k]
        flops[0] += 2.0 * out.numel() * w.shape[1] * w.shape[2]
        return out

    def conv_transpose1d(x, w, *a, **k):
        out = orig["conv_transpose1d"](x, w, *a, **k)
        # w: [C_in, C_out/groups, k]; every input elem feeds C_out/g * k
        flops[0] += 2.0 * x.numel() * w.shape[1] * w.shape[2]
        return out

    def linear(x, w, *a, **k):
        out = orig["linear"](x, w, *a, **k)
        flops[0] += 2.0 * out.numel() * w.shape[1]
        return out

    TF.conv1d, TF.conv_transpose1d, TF.linear = (conv1d, conv_transpose1d,
                                                 linear)
    try:
        wav = torch.zeros(1, 1, int(SR * seconds))
        with torch.no_grad():
            model(wav, n=N_Q)
    finally:
        TF.conv1d = orig["conv1d"]
        TF.conv_transpose1d = orig["conv_transpose1d"]
        TF.linear = orig["linear"]

    # VQ distance GEMMs, closed form (see module docstring)
    frames = int(SR * seconds) // HOP
    dim = kwargs["vq_kwargs"]["dim"]
    card = kwargs["vq_kwargs"]["codebook_size"]
    flops[0] += N_Q * 2.0 * frames * dim * card

    return flops[0] / seconds / 1e9


def analytic_gflops_per_audio_s(frames: int = 75) -> float:
    """The repo's own counter (the one bench.py divides by wall time) over
    the 1-stream streaming enc+dec scan, normalized per audio-second —
    make_jaxpr only traces, so this runs fine on CPU."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from flops_analysis import analyze_jaxpr

    from hilcodec_tpu.models.registry import build_codec_model
    from hilcodec_tpu.utils.hparams import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hps = load_config(os.path.join(repo, "configs/hilcodec_speech.yaml"))
    model = build_codec_model("hilcodec", hps.model_kwargs.to_dict())
    params, vq_state = model.init(jax.random.PRNGKey(0))
    ce, cd = model.init_cache(1)
    wav = np.zeros((1, 1, frames * HOP), np.float32)

    def scan_fn(w, ce, cd):
        tok, ce = model.encode_stream(params, vq_state, w, ce, n=N_Q)
        out, cd = model.decode_stream(params, vq_state, tok, cd)
        return tok, out

    rows = []
    analyze_jaxpr(jax.make_jaxpr(scan_fn)(wav, ce, cd).jaxpr, rows)
    flops = sum(r[1] for r in rows
                if r[0] in ("conv_general_dilated", "dot_general"))
    return flops / (frames * HOP / SR) / 1e9


def main():
    torch_g = torch_reference_gflops_per_audio_s()
    analytic_g = analytic_gflops_per_audio_s()
    ratio = analytic_g / torch_g
    print(f"torch-hook reference generator : {torch_g:8.2f} GFLOP/audio-s")
    print(f"repo analytic (streaming scan) : {analytic_g:8.2f} GFLOP/audio-s")
    print(f"analytic / torch               : {ratio:8.3f}")
    return torch_g, analytic_g


if __name__ == "__main__":
    main()
