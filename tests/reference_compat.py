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
    sys.modules[name] = mod
    return mod


def install_reference_stubs() -> None:
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

        class MelSpectrogram:  # noqa: D401 - placeholder
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                raise RuntimeError("torchaudio stub: MelSpectrogram "
                                   "unavailable")

        tr.Resample = Resample
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
