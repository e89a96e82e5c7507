"""hilcodec_tpu: a TPU-native (JAX/XLA/Pallas) streaming neural audio codec framework.

A from-scratch rebuild of the capabilities of the reference PyTorch
implementation of HILCodec (aask1357/hilcodec): streaming causal-convolutional
codecs (HILCodec, EnCodec, AudioDec, Avocodo) expressed as parameter pytrees
with pure functions, GAN training with a gradient-norm loss balancer,
EMA/k-means residual vector quantization, and data-parallel training over a
`jax.sharding.Mesh`.

Design principles (TPU-first, not a port):
  * One layer spec -> two pure functions: `apply(params, x)` for batched
    training and `step(params, state, frame) -> (y, state)` for O(1)-memory
    streaming, with streaming state carried by `jax.lax.scan`.
  * All shapes static under `jit`; data-dependent control flow via
    `lax.cond` / masked updates.
  * bf16-friendly compute with f32 parameters & EMA statistics; exact-f32
    mode for bit-parity checks against the reference deployment.
  * Distributed training via `shard_map` + `psum` collectives (ICI), not
    NCCL process groups.
"""

__version__ = "0.1.0"
