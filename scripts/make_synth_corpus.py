"""Generate a synthetic speech-like training corpus (no audio datasets ship
with the image). Formant-filtered harmonic pulses with pitch/energy
contours + colored-noise segments, 24 kHz mono wav — enough structure for
the codec to learn meaningful reconstruction for the BASELINE.md
trained-checkpoint quality row.

Usage: python scripts/make_synth_corpus.py OUTDIR [n_train] [n_eval]
Writes OUTDIR/train/*.wav, OUTDIR/eval/*.wav and OUTDIR/{valid,infer,pesq}.txt
filelists (relative to OUTDIR).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hilcodec_tpu.utils.wavio import write_wav

SR = 24000


def synth_utterance(rng: np.random.Generator, seconds: float) -> np.ndarray:
    n = int(seconds * SR)
    t = np.arange(n) / SR
    # pitch contour: random walk around 80-300 Hz
    f0 = np.exp(np.interp(t, np.linspace(0, seconds, 8),
                          rng.uniform(np.log(80), np.log(300), 8)))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    # harmonic-rich source (approximate glottal pulses)
    src = np.zeros(n)
    for k in range(1, 24):
        src += np.sin(k * phase) / k
    # two formant resonators (biquad-ish via FFT shaping per utterance)
    spec = np.fft.rfft(src)
    freqs = np.fft.rfftfreq(n, 1 / SR)
    shape = np.zeros_like(freqs)
    for fc, bw, g in ((rng.uniform(300, 900), 200, 1.0),
                      (rng.uniform(1000, 2500), 350, 0.7),
                      (rng.uniform(2500, 4000), 500, 0.35)):
        shape += g * np.exp(-0.5 * ((freqs - fc) / bw) ** 2)
    voiced = np.fft.irfft(spec * (shape + 0.02), n)
    # amplitude contour (syllable-rate energy modulation + pauses)
    env = np.clip(np.interp(t, np.linspace(0, seconds, 24),
                            rng.uniform(0, 1, 24)) ** 2, 0.0, 1.0)
    sig = voiced * env
    # unvoiced segments: add band-limited noise bursts
    noise = rng.standard_normal(n)
    nspec = np.fft.rfft(noise)
    nshape = np.exp(-0.5 * ((freqs - rng.uniform(2000, 6000)) / 1500) ** 2)
    noise = np.fft.irfft(nspec * nshape, n)
    nenv = (rng.random(24) < 0.3).astype(float)
    sig += noise * np.interp(t, np.linspace(0, seconds, 24), nenv) * 0.3
    peak = np.abs(sig).max() + 1e-9
    return (sig / peak * rng.uniform(0.3, 0.9)).astype(np.float32)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "data/synth"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_eval = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    rng = np.random.default_rng(1234)
    os.makedirs(os.path.join(out, "train"), exist_ok=True)
    os.makedirs(os.path.join(out, "eval"), exist_ok=True)
    for i in range(n_train):
        write_wav(os.path.join(out, "train", f"u{i:04d}.wav"),
                  synth_utterance(rng, rng.uniform(1.2, 4.0)), SR)
    evals = []
    for i in range(n_eval):
        name = f"eval/e{i:03d}.wav"
        write_wav(os.path.join(out, name),
                  synth_utterance(rng, rng.uniform(2.0, 4.0)), SR)
        evals.append(name)
    half = len(evals) // 2
    with open(os.path.join(out, "valid.txt"), "w") as f:
        f.write("".join(e + "|\n" for e in evals[:half]))
    with open(os.path.join(out, "pesq.txt"), "w") as f:
        f.write("".join(e + "|\n" for e in evals[half:]))
    with open(os.path.join(out, "infer.txt"), "w") as f:
        f.write("".join(e + "|\n" for e in evals[:2]))
    print(f"wrote {n_train} train + {n_eval} eval utterances to {out}")


if __name__ == "__main__":
    main()
