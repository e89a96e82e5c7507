"""Streaming frame-program roofline analysis (VERDICT r3 item 1).

Applies the train-step methodology (analytic FLOP/byte floors + measured
time + XLA cost analysis + dispatch accounting) to the compiled streaming
enc+dec program that produces the headline RTF number (bench.py), and
settles the round-2 "0.1% MFU dispatch-bound" vs round-3 "29.8% of bf16
peak" contradiction.

Floors it derives per frame step at B streams:
  * MXU floor    — analytic conv+dot FLOPs / 197 TF/s. NOTE: XLA's DEFAULT
    precision on TPU rounds f32 conv/matmul operands to bf16 (one MXU
    pass, f32 accumulate), so the bf16 peak is the correct denominator
    even for the "f32" parity program. (f32-true would need
    precision=HIGHEST and ~1/4 the peak.)
  * HBM floor    — fusion-optimal bytes: folded weights (read once per
    frame) + 2x cache state (read+write) + frame IO + codebooks,
    at 819 GB/s v5e.
  * dispatch/scheduling floor — #fusions in the compiled while-body x
    the per-fusion overhead measured empirically on this chip by the
    optimization-barrier probe (--probe).

Usage:
  python scripts/streaming_roofline.py [streams] [--seconds S]
      [--dtype f32|bf16w|bf16] [--fused] [--analytic-only] [--probe]
      [--agree]   # token agreement + wav SNR vs the f32 program
      [--shapes]  # measured per-conv-signature MXU floor (chip only)
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np

SR = 24000
V5E_BF16_TFLOPS = 197e12
V5E_HBM_GBPS = 819e9


def tree_bytes(tree):
    import jax
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def build(streams, seconds, dtype_mode, fused):
    import jax
    import jax.numpy as jnp

    from bench import build_bench_model
    from hilcodec_tpu.models.codec import cast_streaming_params

    model = build_bench_model("hilcodec")
    params, vq_state = model.init(jax.random.PRNGKey(0))
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(
        jax.random.PRNGKey(1), vq_state["embed"].shape, jnp.float32)
    params = model.fold_params(params)
    act_dtype = jnp.float32
    if dtype_mode == "bf16w":
        params = cast_streaming_params(params, jnp.bfloat16,
                                       kernels_only=True)
    elif dtype_mode == "bf16":
        params = cast_streaming_params(params, jnp.bfloat16,
                                       kernels_only=False)
        act_dtype = jnp.bfloat16

    hop = model.hop_length
    n_frames = int(seconds * SR) // hop
    wav = (jax.random.normal(jax.random.PRNGKey(2),
                             (streams, 1, n_frames * hop), jnp.float32)
           * 0.3).astype(act_dtype)
    ce, cd = model.init_cache(streams, act_dtype)

    if fused:
        def enc_dec(wav, ce, cd):
            return model.encode_decode_stream(params, vq_state, wav, ce, cd)
    else:
        def enc_dec(wav, ce, cd):
            tokens, ce = model.encode_stream(params, vq_state, wav, ce,
                                             megakernel=False,
                                             stream_chunks=1)
            out, cd = model.decode_stream(params, vq_state, tokens, cd,
                                          megakernel=False, stream_chunks=1)
            return tokens, out, ce, cd

    return model, params, vq_state, enc_dec, wav, ce, cd, n_frames


def analytic_floors(enc_dec, wav, ce, cd, n_frames, params, vq_state):
    """Per-frame-step analytic FLOPs (jaxpr walk, grouped-conv-correct)
    and fusion-optimal HBM bytes."""
    import jax

    from flops_analysis import analyze_jaxpr

    rows = []
    analyze_jaxpr(jax.make_jaxpr(enc_dec)(wav, ce, cd).jaxpr, rows)
    mxu_flops = sum(f for p, f, _b, _d in rows
                    if p in ("conv_general_dilated", "dot_general"))
    elem_flops = sum(f for p, f, _b, _d in rows
                     if p not in ("conv_general_dilated", "dot_general"))
    per_frame = mxu_flops / n_frames

    weight_b = tree_bytes(params)
    books_b = vq_state["embed"].size * vq_state["embed"].dtype.itemsize
    cache_b = tree_bytes(ce) + tree_bytes(cd)
    hop = wav.shape[-1] // n_frames
    io_b = (wav.size // n_frames) * wav.dtype.itemsize \
        + 2 * 8 * wav.shape[0] * 4 + hop  # tokens in+out + wav out approx
    hbm_per_frame = weight_b + books_b + 2 * cache_b + io_b
    return {
        "mxu_flops_per_frame": per_frame,
        "elem_flops_per_frame": elem_flops / n_frames,
        "mxu_floor_us": per_frame / V5E_BF16_TFLOPS * 1e6,
        "weight_bytes": weight_b,
        "codebook_bytes": books_b,
        "cache_bytes_state": cache_b,
        "hbm_bytes_per_frame": hbm_per_frame,
        "hbm_floor_us": hbm_per_frame / V5E_HBM_GBPS * 1e6,
    }


def measure(enc_dec, wav, ce, cd, n_frames):
    import jax

    jfn = jax.jit(enc_dec)
    compiled = jfn.lower(wav, ce, cd).compile()
    o = compiled(wav, ce, cd)          # warmup; both paths return
    jax.block_until_ready(o)           # (tokens, wav, cache_enc, cache_dec)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        o = compiled(wav, o[2], o[3])
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / reps

    cost = {}
    try:
        c = compiled.cost_analysis()
        if isinstance(c, list):
            c = c[0]
        cost = {"xla_flops": float(c.get("flops", 0.0)),
                "xla_bytes": float(c.get("bytes accessed", 0.0))}
    except Exception:
        pass
    n_fusion = 0
    try:
        txt = compiled.as_text()
        n_fusion = txt.count(" fusion(") + txt.count(" fusion.")
        # count custom calls (pallas RVQ) too
        cost["n_custom_call"] = txt.count("custom-call")
    except Exception:
        pass
    return dt, dt / n_frames, cost, n_fusion, o


def probe_fusion_overhead():
    """Per-fusion fixed cost on this backend: a scan whose body is K
    barrier-separated tiny VPU ops; slope of time vs K = overhead/fusion."""
    import jax
    import jax.numpy as jnp

    iters = 300
    res = {}
    for k in (8, 32, 128):
        x0 = jnp.ones((128, 128), jnp.float32)

        def body(x, _, k=k):
            for _i in range(k):
                x = jax.lax.optimization_barrier(x * 1.0001 + 1e-6)
            return x, ()

        f = jax.jit(lambda x, body=body: jax.lax.scan(
            body, x, None, length=iters)[0])
        y = f(x0)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        y = f(x0)
        jax.block_until_ready(y)
        res[k] = (time.perf_counter() - t0) / iters
    ks = sorted(res)
    slope_us = (res[ks[-1]] - res[ks[0]]) / (ks[-1] - ks[0]) * 1e6
    return {f"scan_body_{k}_ops_us_per_iter": round(res[k] * 1e6, 2)
            for k in ks} | {"per_fusion_overhead_us": round(slope_us, 3)}


def collect_conv_signatures(jaxpr, out, scale=1):
    """Unique conv_general_dilated signatures in the program with per-frame
    instance counts (recursing into scan bodies WITHOUT multiplying by trip
    count — callers trace a single-frame program)."""
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in ("scan", "while", "cond", "pjit", "jit", "closed_call",
                    "custom_vjp_call", "custom_jvp_call", "remat",
                    "checkpoint", "custom_vjp_call_jaxpr", "core_call",
                    "xla_call", "shard_map"):
            if prim == "scan":
                collect_conv_signatures(eqn.params["jaxpr"].jaxpr, out,
                                        scale)
            elif prim == "cond":
                for s in eqn.params["branches"]:
                    collect_conv_signatures(s.jaxpr, out, scale)
            elif prim == "while":
                collect_conv_signatures(eqn.params["body_jaxpr"].jaxpr,
                                        out, scale)
            else:
                cj = (eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
                      or eqn.params.get("fun_jaxpr"))
                sub = cj.jaxpr if hasattr(cj, "jaxpr") else cj
                if sub is not None:
                    collect_conv_signatures(sub, out, scale)
            continue
        if prim != "conv_general_dilated":
            continue
        lhs, rhs = [v.aval for v in eqn.invars[:2]]
        p = eqn.params
        sig = (tuple(lhs.shape), str(lhs.dtype),
               tuple(rhs.shape), str(rhs.dtype),
               tuple(p["window_strides"]),
               tuple(tuple(q) for q in p["padding"]),
               tuple(p["lhs_dilation"]), tuple(p["rhs_dilation"]),
               p["dimension_numbers"], p["feature_group_count"])
        out[sig] = out.get(sig, 0) + scale


def probe_conv_shapes(enc_dec, wav, ce, cd, iters=200, K=16):
    """Shape-aware MXU floor: measure every unique conv signature of the
    single-frame program standalone (16 barrier-chained instances inside a
    200-iteration scan; per-conv time = per-iter time minus the backend's
    fixed per-iteration cost, divided by 16). The sum over instance counts
    is the floor the MXU actually admits for these shapes — the analytic
    197 TF/s floor assumes perfect tiling, which 128-row lhs tiles of a
    frame step cannot reach."""
    import jax
    import jax.numpy as jnp

    sigs = {}
    collect_conv_signatures(jax.make_jaxpr(enc_dec)(wav, ce, cd).jaxpr,
                            sigs)

    # fixed per-scan-iteration cost on this backend (same probe as
    # probe_fusion_overhead, small-K point)
    x0 = jnp.ones((128, 128), jnp.float32)

    def tiny(x, _):
        for _i in range(8):
            x = jax.lax.optimization_barrier(x * 1.0001 + 1e-6)
        return x, ()

    f0 = jax.jit(lambda x: jax.lax.scan(tiny, x, None, length=iters)[0])
    jax.block_until_ready(f0(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(f0(x0))
    intercept_us = (time.perf_counter() - t0) / iters * 1e6

    per_shape = []
    total_us = 0.0
    total_flops = 0.0
    for sig, count in sorted(sigs.items(),
                             key=lambda kv: -kv[1]):
        (lshape, ldt, rshape, rdt, ws, pad, ldil, rdil, dn, fg) = sig
        l = (jax.random.normal(jax.random.PRNGKey(3), lshape)
             * 0.1).astype(ldt)
        r = (jax.random.normal(jax.random.PRNGKey(4), rshape)
             * 0.1).astype(rdt)

        def body(c, _, l=l, r=r, ws=ws, pad=pad, ldil=ldil, rdil=rdil,
                 dn=dn, fg=fg, ldt=ldt):
            for _i in range(K):
                o = jax.lax.conv_general_dilated(
                    l + c.astype(ldt), r, window_strides=ws, padding=pad,
                    lhs_dilation=ldil, rhs_dilation=rdil,
                    dimension_numbers=dn, feature_group_count=fg)
                o = jax.lax.optimization_barrier(o)
                c = o.ravel()[0].astype(jnp.float32) * 1e-20
            return c, ()

        f = jax.jit(lambda c: jax.lax.scan(body, c, None,
                                           length=iters)[0])
        c = f(jnp.float32(0.0))
        jax.block_until_ready(c)
        # median of 3 timed reps: a single rep is vulnerable to remote-
        # tunnel stalls (round 4 recorded one 159 s stall inside a timed
        # window, inflating a 16 us conv to a reported 49.9 ms)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(jnp.float32(0.0)))
            reps.append(time.perf_counter() - t0)
        per_iter_us = sorted(reps)[1] / iters * 1e6
        conv_us = max(per_iter_us - intercept_us, 0.0) / K
        # analytic flops of this signature
        cin_per_g = rshape[dn.rhs_spec[1]]
        ksp = 1
        for d in dn.rhs_spec[2:]:
            ksp *= rshape[d]
        o_aval = jax.eval_shape(
            lambda l, r: jax.lax.conv_general_dilated(
                l, r, window_strides=ws, padding=pad, lhs_dilation=ldil,
                rhs_dilation=rdil, dimension_numbers=dn,
                feature_group_count=fg), l, r)
        osize = int(np.prod(o_aval.shape))
        flops = 2 * osize * cin_per_g * ksp
        per_shape.append({
            "lhs": list(lshape), "rhs": list(rshape), "g": fg,
            "count": count, "us": round(conv_us, 2),
            "tflops": round(flops / max(conv_us, 1e-3) / 1e6, 1),
            "mxu_eff": round(flops / max(conv_us, 1e-3) / 1e6
                             / (V5E_BF16_TFLOPS / 1e12), 3),
        })
        total_us += conv_us * count
        total_flops += flops * count
    return {
        "shape_floor_intercept_us": round(intercept_us, 2),
        "shape_floor_conv_us_per_frame": round(total_us, 1),
        "shape_floor_conv_flops_per_frame": total_flops,
        "shape_floor_avg_mxu_eff": round(
            total_flops / max(total_us, 1e-3) / 1e6
            / (V5E_BF16_TFLOPS / 1e12), 3),
        "conv_signatures": per_shape,
    }


def main():
    argv = sys.argv[1:]
    dtype_mode, seconds, fused = "f32", 2.0, "--fused" in argv
    analytic_only = "--analytic-only" in argv
    probe = "--probe" in argv
    agree = "--agree" in argv
    shapes = "--shapes" in argv
    argv = [a for a in argv if a not in ("--fused", "--analytic-only",
                                         "--probe", "--agree", "--shapes")]
    if "--dtype" in argv:
        i = argv.index("--dtype")
        dtype_mode = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--seconds" in argv:
        i = argv.index("--seconds")
        seconds = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    streams = int(argv[0]) if argv else 128

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/hilcodec_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    (model, params, vq_state, enc_dec, wav, ce, cd,
     n_frames) = build(streams, seconds, dtype_mode, fused)
    report = {"streams": streams, "dtype": dtype_mode, "fused": fused,
              "n_frames": n_frames,
              "frame_budget_us": model.hop_length / SR * 1e6}
    fl = analytic_floors(enc_dec, wav, ce, cd, n_frames, params, vq_state)
    report |= {k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in fl.items()}

    if not analytic_only:
        dt, per_frame, cost, n_fusion, out = measure(enc_dec, wav, ce, cd,
                                                     n_frames)
        rtf = streams * seconds / dt
        report |= {
            "measured_total_s": round(dt, 4),
            "measured_us_per_frame": round(per_frame * 1e6, 2),
            "rtf": round(rtf, 1),
            "achieved_tflops": round(
                fl["mxu_flops_per_frame"] / per_frame / 1e12, 2),
            "mfu_vs_bf16_peak": round(
                fl["mxu_flops_per_frame"] / per_frame / V5E_BF16_TFLOPS, 4),
            "achieved_hbm_gbps_floor_bytes": round(
                fl["hbm_bytes_per_frame"] / per_frame / 1e9, 1),
            "n_fusions_total": n_fusion,
        }
        if cost.get("xla_bytes"):
            report["xla_bytes_per_frame_mb"] = round(
                cost["xla_bytes"] / n_frames / 1e6, 2)
            report["xla_hbm_util"] = round(
                cost["xla_bytes"] / n_frames / per_frame / V5E_HBM_GBPS, 4)
        if cost.get("n_custom_call") is not None:
            report["n_custom_calls"] = cost["n_custom_call"]

        if agree and dtype_mode != "f32":
            (_m, _p, _v, f32_fn, wav32, ce32, cd32,
             _n) = build(streams, seconds, "f32", fused)
            ref = jax.jit(f32_fn)(wav32, ce32, cd32)
            tok_ref, wav_ref = np.asarray(ref[0]), np.asarray(
                ref[1], np.float32)
            tok, wv = np.asarray(out[0]), np.asarray(out[1], np.float32)
            report["token_agreement"] = round(
                float((tok == tok_ref).mean()), 6)
            err = wv - wav_ref
            snr = 10 * np.log10(
                (wav_ref ** 2).mean() / max((err ** 2).mean(), 1e-20))
            report["wav_snr_db_vs_f32"] = round(float(snr), 1)

    if probe:
        report |= probe_fusion_overhead()

    if shapes:
        sh = probe_conv_shapes(enc_dec, wav, ce, cd)
        sigs = sh.pop("conv_signatures")
        report |= sh
        print(json.dumps(report))
        for s in sigs:
            print(json.dumps(s))
        return

    print(json.dumps(report))


if __name__ == "__main__":
    main()
