"""Import the reference PyTorch modules (/root/reference) inside the test
environment.

The reference depends on packages absent from this image (librosa, pesq,
pystoi, torchaudio, soundfile); only module *import* is needed to build its
nn.Modules, so light stubs are installed first. librosa.filters.mel is
backed by our own slaney filterbank (hilcodec_tpu/ops/mel.py, itself
torch-oracle-tested), everything else is a no-op placeholder.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_DIR = "/root/reference"


def _stub(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    # Tag so dependency-gated oracle tests can tell this placeholder apart
    # from the real package (importorskip alone would happily import it).
    mod.__is_reference_compat_stub__ = True
    sys.modules[name] = mod
    return mod


def install_reference_stubs() -> None:
    # scipy>=1.13 moved window functions to scipy.signal.windows; the
    # reference's avocodo PQMF does `from scipy.signal import kaiser`
    # (models/avocodo/avocodo/pqmf.py:15)
    try:
        import scipy.signal
        if not hasattr(scipy.signal, "kaiser"):
            scipy.signal.kaiser = scipy.signal.windows.kaiser
    except ImportError:
        pass

    if "librosa" not in sys.modules:
        librosa = _stub("librosa")
        filters = _stub("librosa.filters")

        def mel(*, sr, n_fft, n_mels, fmin=0.0, fmax=None, htk=False,
                norm="slaney", dtype=np.float32):
            from hilcodec_tpu.ops.mel import mel_filterbank
            return np.asarray(
                mel_filterbank(sr, n_fft, n_mels, fmin, fmax),
                dtype=dtype)

        filters.mel = mel
        librosa.filters = filters

        core = _stub("librosa.core")

        def _no_load(*a, **k):
            raise RuntimeError("librosa stub: audio loading unavailable")

        core.load = _no_load
        librosa.core = core
        librosa.load = _no_load

    if "pesq" not in sys.modules:
        pesq = _stub("pesq")
        pesq.pesq = lambda *a, **k: float("nan")
    if "pystoi" not in sys.modules:
        pystoi = _stub("pystoi")
        pystoi.stoi = lambda *a, **k: float("nan")
    if "soundfile" not in sys.modules:
        sf = _stub("soundfile")
        sf.read = sf.write = lambda *a, **k: None
    if "torchaudio" not in sys.modules:
        ta = _stub("torchaudio")
        tr = _stub("torchaudio.transforms")

        class Resample:  # noqa: D401 - placeholder
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        # Real (torch.stft-backed) Spectrogram / MelSpectrogram with
        # torchaudio's exact semantics at the operating points the
        # reference uses (center=False, power=None complex / power=2 mel,
        # normalized = window-norm). Needed so the reference's
        # STFTDiscriminator and MelLoss run as true oracles in the
        # training-step parity test.
        import torch

        class Spectrogram(torch.nn.Module):
            def __init__(self, n_fft=400, win_length=None, hop_length=None,
                         pad=0, window_fn=None, power=2.0, normalized=False,
                         center=True, pad_mode="reflect", onesided=True,
                         **_k):
                super().__init__()
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.win_length // 2
                self.power = power
                self.normalized = normalized
                self.center = center
                window_fn = window_fn or torch.hann_window
                self.register_buffer("window", window_fn(self.win_length))

            def forward(self, x):
                shape = x.shape
                spec = torch.stft(
                    x.reshape(-1, shape[-1]), self.n_fft, self.hop_length,
                    self.win_length, self.window, center=self.center,
                    normalized=False, onesided=True, return_complex=True)
                if self.normalized:  # torchaudio: window normalization
                    spec = spec / self.window.pow(2).sum().sqrt()
                spec = spec.reshape(*shape[:-1], *spec.shape[-2:])
                if self.power is None:
                    return spec
                return spec.abs() ** self.power

        class MelSpectrogram(torch.nn.Module):
            def __init__(self, sample_rate=16000, n_fft=400,
                         win_length=None, hop_length=None, n_mels=128,
                         f_min=0.0, f_max=None, pad=0, power=2.0,
                         normalized=False, center=True,
                         pad_mode="reflect", norm=None,
                         mel_scale="htk", **_k):
                super().__init__()
                self.spectrogram = Spectrogram(
                    n_fft=n_fft, win_length=win_length,
                    hop_length=hop_length, power=power,
                    normalized=normalized, center=center,
                    pad_mode=pad_mode)
                from hilcodec_tpu.ops.mel import mel_filterbank
                fb = mel_filterbank(sample_rate, n_fft, n_mels, f_min,
                                    f_max, norm=norm,
                                    htk=(mel_scale == "htk"))
                self.register_buffer("fb",
                                     torch.from_numpy(np.asarray(fb)))

            def forward(self, x):
                spec = self.spectrogram(x)          # [..., F, L]
                return torch.matmul(self.fb.to(spec.dtype), spec)

        tr.Resample = Resample
        tr.Spectrogram = Spectrogram
        tr.MelSpectrogram = MelSpectrogram
        ta.transforms = tr


def reference_on_path() -> None:
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)


def import_reference(module: str):
    """install stubs + sys.path, then import e.g.
    'models.hilcodec.modules.seanet'."""
    install_reference_stubs()
    reference_on_path()
    import importlib
    return importlib.import_module(module)
