"""Benchmark: streaming encode+decode real-time factor per TPU chip.

Headline metric (BASELINE.md): aggregate real-time factor for 24 kHz
frame-by-frame streaming encode+decode — `concurrent_streams x per-stream
RTF`, i.e. seconds of audio encoded AND decoded per wall-second per chip.
The reference's deployment does ~1x real-time per CPU core
(test_onnx.py:41-47); the rebuild target is >=100x per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def parse_args(argv):
    """[streams] [--model M] [--mesh] [--seconds S] [--unroll K]
    [--chunks G] [--frames F] [--megakernel|--no-megakernel] — fail fast
    on malformed input."""
    seconds, mesh = 4.0, "--mesh" in argv
    dispatch = "--dispatch" in argv
    fused = "--fused" in argv
    mega = None                        # auto (stream-count-aware on TPU)
    if "--megakernel" in argv:
        mega = True
    if "--no-megakernel" in argv:
        mega = False
    argv = [a for a in argv
            if a not in ("--mesh", "--megakernel", "--no-megakernel",
                         "--dispatch", "--fused")]
    unroll, chunks = 1, None   # chunks None = auto (groups of 128)
    model_name = "hilcodec"
    dtype_mode = "f32"
    if "--dtype" in argv:
        i = argv.index("--dtype")
        if i + 1 >= len(argv):
            sys.exit("error: --dtype requires a value")
        dtype_mode = argv[i + 1]
        if dtype_mode not in ("f32", "bf16w", "bf16"):
            sys.exit(f"error: unknown --dtype {dtype_mode!r} "
                     "(f32 | bf16w | bf16)")
        argv = argv[:i] + argv[i + 2:]
    depthwise = "conv"
    if "--depthwise" in argv:
        i = argv.index("--depthwise")
        if i + 1 >= len(argv):
            sys.exit("error: --depthwise requires a value")
        depthwise = argv[i + 1]
        if depthwise not in ("conv", "shift"):
            sys.exit(f"error: unknown --depthwise {depthwise!r} "
                     "(conv | shift)")
        argv = argv[:i] + argv[i + 2:]
    frames = 1
    for flag in ("--unroll", "--chunks", "--frames", "--model"):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                sys.exit(f"error: {flag} requires a value")
            if flag == "--model":
                model_name = argv[i + 1]
                if model_name not in ("hilcodec", "encodec", "audiodec",
                                      "avocodo"):
                    sys.exit(f"error: unknown --model {model_name!r}")
                argv = argv[:i] + argv[i + 2:]
                continue
            try:
                val = int(argv[i + 1])
            except ValueError:
                sys.exit(f"error: {flag} requires an int, got "
                         f"{argv[i + 1]!r}")
            if flag == "--unroll":
                unroll = val
            elif flag == "--frames":
                frames = val
            else:
                chunks = val
            argv = argv[:i] + argv[i + 2:]
    if "--seconds" in argv:
        i = argv.index("--seconds")
        if i + 1 >= len(argv):
            sys.exit("error: --seconds requires a value")
        try:
            seconds = float(argv[i + 1])
        except ValueError:
            sys.exit(f"error: --seconds requires a number, got "
                     f"{argv[i + 1]!r}")
        argv = argv[:i] + argv[i + 2:]
    pos = [a for a in argv if not a.startswith("-")]
    try:
        streams = int(pos[0]) if pos else 128
    except ValueError:
        sys.exit(f"error: streams must be an integer, got {pos[0]!r}")
    return (streams, seconds, mesh, mega, unroll, chunks, model_name,
            dispatch, dtype_mode, fused, frames, depthwise)


def run_dispatch_bench(model, params, vq_state, streams):
    """Per-dispatch serving latency (VERDICT round-2 weak #6): ONE frame
    enc+dec per call — the program a live interactive stream runs — with
    donated cache buffers. Two numbers:

      * blocking p50/p99: host submits, blocks, repeats — what a serving
        loop over this transport actually sees (tunnel RTT included);
      * pipelined amortized: N frames queued back-to-back, one final
        block — the device-side per-dispatch floor with the host running
        ahead (the transport overhead amortizes away).
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    hop = model.hop_length

    from functools import partial

    @partial(jax.jit, donate_argnums=(1, 2))
    def one_frame(wav, cache_enc, cache_dec):
        tokens, cache_enc = model.encode_stream(
            params, vq_state, wav, cache_enc, frames_per_step=1,
            megakernel=False, stream_chunks=1)
        out, cache_dec = model.decode_stream(
            params, vq_state, tokens, cache_dec, frames_per_step=1,
            megakernel=False, stream_chunks=1)
        return tokens, out, cache_enc, cache_dec

    wav = jax.random.normal(jax.random.PRNGKey(2), (streams, 1, hop),
                            jnp.float32) * 0.3
    ce, cd = model.init_cache(streams)
    tokens, out, ce, cd = one_frame(wav, ce, cd)
    jax.block_until_ready(out)

    # blocking: one frame per round trip
    times = []
    for _ in range(100):
        t0 = time.perf_counter()
        tokens, out, ce, cd = one_frame(wav, ce, cd)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times) * 1e3

    # pipelined: queue N dispatches, block once at the end
    n_pipe = 200
    t0 = time.perf_counter()
    for _ in range(n_pipe):
        tokens, out, ce, cd = one_frame(wav, ce, cd)
    jax.block_until_ready(out)
    amortized = (time.perf_counter() - t0) / n_pipe * 1e3

    frame_ms = hop / 24000 * 1e3
    result = {
        "metric": "per_dispatch_frame_latency_ms",
        "value": round(float(np.percentile(times, 50)), 3),
        "unit": f"ms blocking p50 (streams={streams}, frame={frame_ms:.2f}"
                f" ms; p99={np.percentile(times, 99):.3f}, "
                f"pipelined_amortized={amortized:.3f})",
        "vs_baseline": round(frame_ms / float(np.percentile(times, 50)), 3),
    }
    print(json.dumps(result))


def build_bench_model(model_name):
    """Per-family flagship streaming operating point (reference
    test_onnx.py drives every family the same way; README.md:55 notes
    AudioDec's hop 300). All at 24 kHz with 8 active quantizers
    (= the speech 6 kbps point, bitrate-comparable across families)."""
    from hilcodec_tpu.models.codec import CodecModel
    from hilcodec_tpu.ops.rvq import ResidualVQ

    if model_name == "hilcodec":
        from hilcodec_tpu.models.hilcodec import HILCodec
        codec = HILCodec(res_scale_enc=0.5773502691896258,
                         res_scale_dec=0.5773502691896258)
        vq_dim = 128
    elif model_name == "encodec":
        from hilcodec_tpu.models.encodec import EncodecModel
        codec = EncodecModel()          # SEANet + 2-layer LSTM bottleneck
        vq_dim = 128
    elif model_name == "avocodo":
        from hilcodec_tpu.models.avocodo import AvocodoModel
        codec = AvocodoModel()          # streams the full-rate head
        vq_dim = 128
    else:
        from hilcodec_tpu.models.audiodec import AudioDec
        codec = AudioDec()              # strides (3,4,5,5) -> hop 300
        vq_dim = 64
    return CodecModel(codec, ResidualVQ(dim=vq_dim, codebook_size=1024,
                                        num_quantizers=8,
                                        kmeans_init=False))


def main():
    (streams, seconds, use_mesh, mega, unroll, chunks, model_name,
     dispatch, dtype_mode, fused, frames, depthwise) = parse_args(
        sys.argv[1:])
    import jax
    import jax.numpy as jnp
    if depthwise != "conv":
        # route pure-depthwise convs (incl. the streaming convT step) as
        # k shifted VPU FMAs instead of XLA's grouped-conv lowering — the
        # round-4 shapes probe measured that lowering at 83-298 us for
        # ops whose tap-sum form is pure fusable elementwise work
        from hilcodec_tpu.ops.conv import set_depthwise_lowering
        set_depthwise_lowering(depthwise)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/hilcodec_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    # flagship speech config by default (hop 320, 8 quantizers);
    # --model encodec/audiodec benches the other streaming families
    model = build_bench_model(model_name)
    key = jax.random.PRNGKey(0)
    params, vq_state = model.init(key)
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(
        jax.random.PRNGKey(1), vq_state["embed"].shape, jnp.float32)
    # deployment path: folded (weight-norm removed, scalings merged) params
    params = model.fold_params(params)

    # --dtype precision modes (streaming roofline work, BASELINE round 4):
    #   f32   - parity default
    #   bf16w - bf16 conv kernels, f32 activations/caches: halves the
    #           per-frame weight reads; MXU operand bits unchanged under
    #           XLA's DEFAULT precision (bf16-rounded operands either way)
    #   bf16  - bf16 everything (params, caches, activations); RVQ
    #           distances still f32 (ops/rvq.py casts internally)
    from hilcodec_tpu.models.codec import cast_streaming_params
    act_dtype = jnp.float32
    if dtype_mode == "bf16w":
        params = cast_streaming_params(params, jnp.bfloat16,
                                       kernels_only=True)
    elif dtype_mode == "bf16":
        params = cast_streaming_params(params, jnp.bfloat16,
                                       kernels_only=False)
        act_dtype = jnp.bfloat16

    if dispatch:
        run_dispatch_bench(model, params, vq_state, streams)
        return

    hop = model.hop_length
    sr = 24000
    # --frames F > 1 = block streaming: F frames per scan iteration.
    # Tokens are bit-identical to frame-by-frame (the causal cache algebra
    # is block-size-invariant, tests/test_codec_api.py::
    # test_stream_block_sizes_agree); the trade is algorithmic latency
    # (F x 13.33 ms) for larger per-kernel shapes that tile the MXU better
    # and amortize the backend's fixed per-scan-iteration cost.
    frames_per_step = frames     # default 1 = true 13.33 ms streaming
    n_frames = int(seconds * sr) // hop
    n_frames -= n_frames % frames_per_step

    wav = jax.random.normal(jax.random.PRNGKey(2),
                            (streams, 1, n_frames * hop),
                            jnp.float32).astype(act_dtype) * 0.3
    cache_enc, cache_dec = model.init_cache(streams, act_dtype)

    n_dev = len(jax.devices())
    if use_mesh and n_dev > 1:
        # Serving scale-out: shard the stream dimension over all chips
        # (no collectives in the compiled program; throughput scales with
        # the mesh). Single-chip runs are unaffected.
        from hilcodec_tpu.parallel.mesh import (data_parallel_mesh,
                                                replicate, shard_streams)
        mesh = data_parallel_mesh()
        params = replicate(mesh, params)
        vq_state = replicate(mesh, vq_state)
        wav, cache_enc = shard_streams(mesh, wav=wav, cache=cache_enc)
        cache_dec = shard_streams(mesh, cache=cache_dec)

    if fused:
        @jax.jit
        def enc_dec(wav, cache_enc, cache_dec):
            return model.encode_decode_stream(
                params, vq_state, wav, cache_enc, cache_dec,
                frames_per_step=frames_per_step, unroll=unroll)
    else:
        @jax.jit
        def enc_dec(wav, cache_enc, cache_dec):
            tokens, cache_enc = model.encode_stream(
                params, vq_state, wav, cache_enc,
                frames_per_step=frames_per_step, megakernel=mega,
                unroll=unroll, stream_chunks=chunks)
            out, cache_dec = model.decode_stream(
                params, vq_state, tokens, cache_dec,
                frames_per_step=frames_per_step, megakernel=mega,
                unroll=unroll, stream_chunks=chunks)
            return tokens, out, cache_enc, cache_dec

    # compile once; the AOT executable serves warmup, timing AND the MFU
    # cost analysis (no second trace through the jit cache)
    compiled = enc_dec.lower(wav, cache_enc, cache_dec).compile()
    tokens, out, ce, cd = compiled(wav, cache_enc, cache_dec)
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        tokens, out, ce, cd = compiled(wav, ce, cd)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    audio_seconds = streams * n_frames * hop / sr
    rtf = audio_seconds / dt

    metric = "streaming_encdec_rtf_per_chip"
    if model_name != "hilcodec":
        metric += f"_{model_name}"
    if dtype_mode != "f32":
        metric += f"_{dtype_mode}"
    if fused:
        metric += "_fused"
    if frames_per_step != 1:
        metric += f"_f{frames_per_step}"
    if depthwise != "conv":
        metric += f"_dw{depthwise}"
    result = {
        "metric": metric,
        "value": round(rtf, 2),
        "unit": f"x_realtime_24khz (streams={streams}, "
                f"frame={hop} samples"
                + (f", block={frames_per_step} frames"
                   if frames_per_step != 1 else "") + ")",
        "vs_baseline": round(rtf / 100.0, 3),
    }
    # MFU accounting (VERDICT round-1 weak #5): XLA's own analytic FLOP
    # count for the compiled program vs the chip's matmul peak. The frame
    # step is dispatch/bandwidth-bound, so single-digit-% MFU is expected
    # and the number shows the remaining perf envelope.
    # Pallas kernels are custom calls with zero FLOPs in cost analysis —
    # when the megakernel path may be active, take the FLOP count from the
    # equivalent scan-path program (same math, fully analyzable).
    from hilcodec_tpu.models.codec import _auto_megakernel
    mega_active = (mega if mega is not None
                   else _auto_megakernel(model.codec, streams))
    flops_src = compiled
    if mega_active:
        @jax.jit
        def enc_dec_scan(wav, cache_enc, cache_dec):
            tokens, cache_enc = model.encode_stream(
                params, vq_state, wav, cache_enc,
                frames_per_step=frames_per_step, megakernel=False)
            out, cache_dec = model.decode_stream(
                params, vq_state, tokens, cache_dec,
                frames_per_step=frames_per_step, megakernel=False)
            return tokens, out, cache_enc, cache_dec
        try:
            flops_src = enc_dec_scan.lower(
                wav, cache_enc, cache_dec).compile()
        except Exception:
            pass
    scan_fn = enc_dec_scan if mega_active else enc_dec
    flops, mfu, peak = _mfu(jax, flops_src, dt,
                            fn=scan_fn, args=(wav, cache_enc, cache_dec))
    if flops:
        result["achieved_tflops"] = round(flops / dt / 1e12, 3)
        if mfu is not None:
            result["mfu_vs_peak"] = round(mfu, 5)
            result["peak_tflops_assumed"] = peak
    print(json.dumps(result))


def _mfu(jax, compiled, dt, fn=None, args=None):
    """(flops/step, mfu, peak TFLOPs); mfu is None off-TPU or for unknown
    chips. When (fn, args) are given, FLOPs come from the analytic jaxpr
    walk (scripts/flops_analysis.py — grouped-conv-correct, scan-aware);
    otherwise falls back to XLA cost analysis. (Round-3 note: the two now
    agree on this model family — the earlier "cost analysis overcounts
    depthwise convs" caveat traced to a broken component measurement, not
    to the counter.)"""
    flops = 0.0
    if fn is not None:
        try:
            import sys as _sys
            _sys.path.insert(0, "scripts")
            from flops_analysis import analyze_jaxpr
            rows = []
            analyze_jaxpr(jax.make_jaxpr(fn)(*args).jaxpr, rows)
            flops = float(sum(r[1] for r in rows if r[0] in
                              ("conv_general_dilated", "dot_general")))
        except Exception:
            flops = 0.0
    if flops <= 0:
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
        except Exception:
            return 0.0, None, None
    kind = jax.devices()[0].device_kind.lower()
    # bf16/f32-accumulate MXU peaks per chip (public TPU specs)
    peaks = {"v5 lite": 197, "v5litepod": 197, "v5e": 197,
             "v4": 275, "v5p": 459, "v6": 918, "trillium": 918}
    peak = next((v for k, v in peaks.items() if k in kind), None)
    if peak is None or flops <= 0:
        return flops, None, None
    return flops, flops / dt / (peak * 1e12), peak


if __name__ == "__main__":
    main()
