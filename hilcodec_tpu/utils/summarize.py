"""TensorBoard observability + terminal helpers.

Reference: utils/summarize.py (scalars / histograms / spectrogram images /
audio; per-parameter + per-gradient histograms guarded against NaN/Inf),
utils/terminal.py (ANSI line control), utils/verbose.py (rank-0 gating).
"""

from __future__ import annotations

import sys
from typing import Any, Dict, Optional

import numpy as np

from .pytree import key_str as _key_str


def get_writer(log_dir: str):
    # torch's writer encodes audio without the soundfile dependency
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:
        from tensorboardX import SummaryWriter
    return SummaryWriter(log_dir)


def plot_spectrogram_to_numpy(spec: np.ndarray) -> np.ndarray:
    """[n_mels, T] log-mel -> HWC uint8 image (utils/summarize.py plot)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(10, 3))
    im = ax.imshow(spec, aspect="auto", origin="lower",
                   interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.xlabel("Frames")
    plt.ylabel("Channels")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


def summarize(writer, epoch: int, scalars: Optional[Dict[str, float]] = None,
              scalars_not_to_print: Optional[Dict[str, float]] = None,
              specs: Optional[Dict[str, np.ndarray]] = None,
              audios: Optional[Dict[str, np.ndarray]] = None,
              hists: Optional[Dict[str, np.ndarray]] = None,
              sampling_rate: int = 24000, echo: bool = True) -> None:
    """Write a summary bundle (utils/summarize.py:88-124)."""
    scalars = scalars or {}
    for k, v in scalars.items():
        writer.add_scalar(k, float(v), epoch)
    for k, v in (scalars_not_to_print or {}).items():
        writer.add_scalar(k, float(v), epoch)
    for k, v in (specs or {}).items():
        writer.add_image(k, plot_spectrogram_to_numpy(np.asarray(v)),
                         epoch, dataformats="HWC")
    for k, v in (audios or {}).items():
        wav = np.asarray(v).reshape(-1)
        try:
            writer.add_audio(k, wav[:, None], epoch,
                             sample_rate=sampling_rate)
        except (ImportError, ModuleNotFoundError):
            pass  # writer backend lacks an audio encoder
    for k, v in (hists or {}).items():
        writer.add_histogram(k, v, epoch)
    if echo and scalars:
        print("  ".join(f"{k}: {float(v):.4f}" for k, v in scalars.items()))


def plot_param_and_grad(hists: Dict[str, np.ndarray], params: Any,
                        grads: Optional[Any] = None,
                        prefix: str = "model") -> None:
    """Per-parameter (and per-gradient) histogram dump, NaN/Inf-guarded
    (utils/summarize.py:16-39)."""
    import jax

    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = prefix + "/" + "/".join(_key_str(k) for k in kp)
        arr = np.asarray(leaf).ravel()
        if arr.size and np.isfinite(arr).all():
            hists[name] = arr
    if grads is not None:
        for kp, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
            name = prefix + "_grad/" + "/".join(_key_str(k) for k in kp)
            arr = np.asarray(leaf).ravel()
            if arr.size and np.isfinite(arr).all():
                hists[name] = arr


# -- terminal control (utils/terminal.py) -----------------------------------

def clear_current_line(file=sys.stdout) -> None:
    file.write("\r\033[K")
    file.flush()


def progress_line(text: str, file=sys.stdout) -> None:
    file.write("\r\033[K" + text)
    file.flush()
