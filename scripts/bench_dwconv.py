"""Micro-benchmark: depthwise conv1d forward vs backward lowering on TPU.

Hypothesis under test (BASELINE round-3 bottleneck row): XLA TPU lowers the
*forward* grouped/depthwise conv well but the *gradient* convs
(feature_group_count = batch_group_count transposes) fall off the fast
path, making the ~50 depthwise-conv backwards dominate the train step.

Compares, at the generator's real train shapes, three formulations:
  conv    — lax.conv_general_dilated with feature_group_count=C (today's)
  shift   — k shifted elementwise FMAs (VPU path, fuses; grad is also
            shifts, never leaves the elementwise regime)
and times fwd and grad(sum) for each.

Usage: python scripts/bench_dwconv.py [batch]
Prints one JSON line per (shape, formulation).
"""
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jax import lax

    _DIMS = ("NCH", "OIH", "NCH")

    def conv_dw(x, w, stride=1, dilation=1):
        k = w.shape[-1]
        pad = dilation * (k - 1) - (stride - 1)
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(stride,),
            padding=[(pad, 0)], rhs_dilation=(dilation,),
            dimension_numbers=_DIMS, feature_group_count=x.shape[1])

    def shift_dw(x, w, stride=1, dilation=1):
        """Depthwise causal conv as k shifted FMAs. w: [C, 1, k]."""
        k = w.shape[-1]
        pad = dilation * (k - 1) - (stride - 1)
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
        tout = (xp.shape[-1] - dilation * (k - 1) - 1) // stride + 1
        y = jnp.zeros((x.shape[0], x.shape[1], tout), x.dtype)
        for j in range(k):
            sl = lax.slice(xp, (0, 0, j * dilation),
                           (xp.shape[0], xp.shape[1],
                            j * dilation + (tout - 1) * stride + 1),
                           (1, 1, stride))
            y = y + w[None, :, 0, j:j + 1] * sl
        return y

    # (C, T, k, stride, dilation) at the speech model's encoder/decoder
    # stages (channels 64/96 doubling per stage, strides [8,5,4,2])
    shapes = [
        (64, 24000, 5, 1, 1),    # enc stage 0 residual dw
        (128, 24000, 16, 8, 1),  # enc down dw (k=2*stride)
        (128, 3000, 5, 1, 1),
        (256, 600, 5, 1, 1),
        (512, 150, 5, 1, 1),
        (96, 24000, 5, 1, 1),    # dec full-rate residual dw
    ]

    def time_fn(fn, argsets, reps=20):
        out = fn(*argsets[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(*argsets[i % len(argsets)])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    rng = np.random.default_rng(0)
    for C, T, k, s, d in shapes:
        xs = [jnp.asarray(rng.standard_normal((batch, C, T)),
                          jnp.float32) for _ in range(4)]
        w = jnp.asarray(rng.standard_normal((C, 1, k)), jnp.float32)
        row = {"C": C, "T": T, "k": k, "stride": s}
        for name, f in (("conv", conv_dw), ("shift", shift_dw)):
            fwd = jax.jit(lambda x, w, f=f: f(x, w, s, d))
            g = jax.jit(jax.grad(
                lambda x, w, f=f: jnp.sum(f(x, w, s, d)), argnums=(0, 1)))
            row[f"{name}_fwd_ms"] = round(
                time_fn(fwd, [(x, w) for x in xs]) * 1e3, 3)
            row[f"{name}_bwd_ms"] = round(
                time_fn(g, [(x, w) for x in xs]) * 1e3, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
