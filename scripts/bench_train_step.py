"""Time the full GAN train step on-chip, f32 vs bf16, with MFU/roofline.

Usage: python scripts/bench_train_step.py [bf16|f32] [batch] [--breakdown]
         [--config=configs/<family>.yaml] [--dw=] [--fbd=] [--fam=]
         [--remat=none|disc|gen|mel|all]

Prints one JSON line {dtype, batch, ms_per_step, audio_s_per_s,
achieved_tflops, mfu_vs_peak, hbm_gb_per_s, roofline_bound, ...}.
--breakdown additionally times the step's components (generator fwd/bwd,
discriminator fwd, D backward, mel-loss pullback, per-family balancer
pullbacks) to name what dominates the step (VERDICT round-2 weak #1).
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

# public v5e numbers: 197 TFLOP/s bf16 MXU peak, 819 GB/s HBM BW
PEAKS_TFLOPS = {"v5 lite": 197, "v5litepod": 197, "v5e": 197, "v4": 275,
                "v5p": 459, "v6": 918, "trillium": 918}
HBM_GBPS = {"v5 lite": 819, "v5litepod": 819, "v5e": 819, "v4": 1228,
            "v5p": 2765, "v6": 1640, "trillium": 1640}


def _cost(compiled):
    """XLA cost-analysis FLOPs/bytes. The analytic jaxpr counter
    (scripts/flops_analysis.py) agrees with these counts on this model
    family (generator forward: 828 GFLOP analytic vs 827 XLA) — the
    round-3 "dense-counts depthwise" caveat traced to impossible
    *measurements* (1.8 ms for 4.2 ms of MXU-floor work), not to this
    counter. MFU derived here is still an upper bound on executed work:
    XLA CSE dedupes the repeated discriminator forwards."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return (float(cost.get("flops", 0.0)),
                float(cost.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def _time_fn(fn, argsets, reps=10):
    """Time fn over `reps` calls, cycling through pre-staged argument
    variants. CRITICAL on the axon backend: repeated dispatches with
    byte-identical inputs can be deduped/short-circuited upstream, making
    fixed-input loops report near-zero times — every rep must differ in
    at least one input. Each rep blocks individually so per-rep spread is
    visible (a tiny min with a huge max means the loop was pipelined or
    deduped, not computed)."""
    import jax
    out = fn(*argsets[0])
    jax.block_until_ready(out)
    jax.block_until_ready(argsets)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(*argsets[i % len(argsets)])
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]  # median of individually-blocked reps


def main():
    args = [a for a in sys.argv[1:]
            if a != "--breakdown"
            and not a.startswith(("--dw", "--fbd", "--fam", "--config",
                                  "--remat"))]
    breakdown = "--breakdown" in sys.argv
    dw = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--dw=")),
              "conv")
    fbd = next((a.split("=", 1)[1] for a in sys.argv
                if a.startswith("--fbd=")), "conv2d")
    fam = next((a.split("=", 1)[1] for a in sys.argv
                if a.startswith("--fam=")), "separate")
    remat = next((a.split("=", 1)[1] for a in sys.argv
                  if a.startswith("--remat=")), "none")
    config = next((a.split("=", 1)[1] for a in sys.argv
                   if a.startswith("--config=")),
                  "configs/hilcodec_speech_synth.yaml")
    which = args[0] if args else "f32"
    batch = int(args[1]) if len(args) > 1 else 24

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:  # share the compile cache with bench.py: A/B series recompile the
        jax.config.update("jax_compilation_cache_dir",  # same big programs
                          "/tmp/hilcodec_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from hilcodec_tpu.ops import conv as conv_ops
    from hilcodec_tpu.train.loop import build_trainer
    from hilcodec_tpu.utils.hparams import load_config

    from hilcodec_tpu.models import discriminators as disc_mod

    hps = load_config(config)
    trainer = build_trainer(hps)
    # after build_trainer (which resets both flags from the config)
    conv_ops.set_depthwise_lowering(dw)
    disc_mod.set_fbd_lowering(fbd)
    # avocodo's trainer has no compute_dtype/fam_mode fields (fp32 discs
    # per the paper; simple-balancer plumbing) — only override when present
    if which == "bf16" and hasattr(trainer, "compute_dtype"):
        trainer = dataclasses.replace(trainer, compute_dtype=jnp.bfloat16)
    if fam != "separate" and hasattr(trainer, "fam_mode"):
        trainer = dataclasses.replace(trainer, fam_mode=fam)
    if remat != "none" and hasattr(trainer, "remat"):
        trainer = dataclasses.replace(trainer, remat=remat)
    state = trainer.init_state(jax.random.PRNGKey(0))
    seg = hps.data.get("segment_size", 24000)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, 1, seg)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(1)

    step = jax.jit(trainer.train_step)
    compiled = step.lower(state, wav, key).compile()
    flops, bytes_acc = _cost(compiled)

    state, m = compiled(state, wav, key)
    jax.block_until_ready(m["loss/freq"])
    reps = 10
    t0 = time.perf_counter()
    for i in range(reps):
        state, m = compiled(state, wav, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(m["loss/freq"])
    dt = (time.perf_counter() - t0) / reps

    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in PEAKS_TFLOPS.items() if k in kind), None)
    bw = next((v for k, v in HBM_GBPS.items() if k in kind), None)
    out = {
        "config": config,
        "dtype": which, "batch": batch, "dw": dw, "fbd": fbd, "fam": fam,
        "ms_per_step": round(dt * 1e3, 1),
        "audio_s_per_s": round(batch * seg / 24000 / dt, 1),
        "finite": float(m["finite"]),
        "freq": float(m["loss/freq"]),
    }
    if flops:
        out["flops_per_step_g"] = round(flops / 1e9, 1)
        out["achieved_tflops"] = round(flops / dt / 1e12, 2)
        if peak:
            out["mfu_vs_peak"] = round(flops / dt / (peak * 1e12), 4)
            out["peak_tflops_assumed"] = peak
    if bytes_acc:
        out["hbm_gb_per_step"] = round(bytes_acc / 1e9, 2)
        out["hbm_gb_per_s"] = round(bytes_acc / dt / 1e9, 1)
        if bw:
            out["hbm_util_vs_peak"] = round(bytes_acc / dt / (bw * 1e9), 4)
        # analytic floor: whichever wall the program hits first
        t_flops = flops / (peak * 1e12) if peak else 0.0
        t_bw = bytes_acc / (bw * 1e9) if bw else 0.0
        out["roofline_floor_ms"] = round(max(t_flops, t_bw) * 1e3, 2)
        out["roofline_bound"] = "hbm" if t_bw > t_flops else "mxu"
    print(json.dumps(out))

    if not breakdown:
        return

    # ---- component timing: where does the step go? ------------------------
    cd = trainer.compute_dtype
    cast = (lambda t: t) if cd == jnp.float32 else (
        lambda t: jax.tree.map(
            lambda x: x.astype(cd)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t))
    model, disc, mel = trainer.model, trainer.disc, trainer.mel_loss

    @jax.jit
    def gen_fwd(state, wav, key):
        wav_g, _, loss_vq, _ = model.forward(
            cast(state.params_g), state.vq_state, cast(wav), key,
            training=True)
        return wav_g, loss_vq

    @jax.jit
    def gen_fwd_bwd(state, wav, key):
        def f(p):
            wav_g, _, loss_vq, _ = model.forward(
                cast(p), state.vq_state, cast(wav), key, training=True)
            return jnp.sum(wav_g.astype(jnp.float32)) + loss_vq
        return jax.grad(f)(state.params_g)

    @jax.jit
    def disc_fwd(state, wav):
        lg, fg = disc.apply(cast(state.params_d), cast(wav))
        return jax.tree.leaves(lg)[0]

    @jax.jit
    def mel_pullback(state, wav, key):
        wav_g, _, _, _ = model.forward(
            cast(state.params_g), state.vq_state, cast(wav), key,
            training=True)
        wav_g = jax.lax.stop_gradient(wav_g)
        val, pull = jax.vjp(lambda w: mel(w, wav)["freq"], wav_g)
        return pull(jnp.ones_like(val))[0]

    @jax.jit
    def d_bwd(state, wav, key):
        wav_g, _, _, _ = model.forward(
            cast(state.params_g), state.vq_state, cast(wav), key,
            training=True)
        wav_g = jax.lax.stop_gradient(wav_g)

        def d_fn(pd):
            lg, _ = disc.apply(cast(pd), cast(wav_g))
            lr, _ = disc.apply(cast(pd), cast(wav))
            f32 = lambda t: jax.tree.map(
                lambda x: x.astype(jnp.float32), t)
            from hilcodec_tpu.models import losses as Lo
            return Lo.discriminator_loss(f32(lg), f32(lr))
        return jax.value_and_grad(d_fn)(state.params_d)[0]

    @jax.jit
    def fam_pullbacks(state, wav, key):
        """The K per-discriminator-family cotangent pullbacks w.r.t. wav_g
        (the balancer's inputs) — G-side disc work."""
        from hilcodec_tpu.models import losses as Lo
        wav_g, _, _, _ = model.forward(
            cast(state.params_g), state.vq_state, cast(wav), key,
            training=True)
        wav_g = jax.lax.stop_gradient(wav_g)
        f32 = lambda t: jax.tree.map(lambda x: x.astype(jnp.float32), t)
        pd = cast(state.params_d)
        _, fmaps_r = disc.apply(pd, cast(wav))
        fmaps_r = jax.lax.stop_gradient(f32(fmaps_r))
        outs = []
        for name, d in disc.discs.items():
            def fam(wv, d=d, name=name):
                lg, fg = d.apply(pd[name], cast(wv))
                g_l = Lo.generator_loss({name: f32(lg)})[f"{name}_g"]
                fm_l = Lo.feature_loss_normalized(
                    {name: f32(fg)}, {name: fmaps_r[name]})[f"{name}_fm"]
                return (g_l, fm_l)
            (g_l, fm_l), pull = jax.vjp(fam, wav_g)
            one, zero = jnp.ones_like(g_l), jnp.zeros_like(g_l)
            outs.append(pull((one, zero))[0] + pull((zero, one))[0])
        return sum(outs)

    @jax.jit
    def grads_only(state, wav, key):
        aux = trainer.compute_grads(state, wav, key)
        return aux["g_grads"], aux["d_grads"]

    # pre-staged input variants so no two reps see identical buffers
    keys = [jax.random.PRNGKey(100 + i) for i in range(10)]
    wavs = [wav * (1.0 + 1e-6 * i) for i in range(10)]
    swk = [(state, w, k) for w, k in zip(wavs, keys)]
    sw = [(state, w) for w in wavs]
    comps = {
        "gen_fwd": (gen_fwd, swk),
        "gen_fwd_bwd": (gen_fwd_bwd, swk),
        "disc_fwd_1x": (disc_fwd, sw),
        "mel_fwd_pullback": (mel_pullback, swk),
        "fam_pullbacks": (fam_pullbacks, swk),
        "d_loss_bwd": (d_bwd, swk),
        "compute_grads": (grads_only, swk),
    }
    # analytic MXU floor per component (jaxpr walk, grouped-conv-correct):
    # a measured time below its floor is physically impossible => the
    # measurement, not the chip, is wrong (round-3 1.8 ms gen_fwd case)
    sys.path.insert(0, "scripts")
    from flops_analysis import analyze_jaxpr
    out_rows = {}
    for name, (f, sets) in comps.items():
        rows = []
        try:
            analyze_jaxpr(jax.make_jaxpr(f)(*sets[0]).jaxpr, rows)
            fl = sum(r[1] for r in rows
                     if r[0] in ("conv_general_dilated", "dot_general"))
            floor_ms = fl / ((peak or 197) * 1e12) * 1e3
        except Exception:
            floor_ms = 0.0
        t_ms = _time_fn(f, sets) * 1e3
        out_rows[name] = {"ms": round(t_ms, 1),
                          "mxu_floor_ms": round(floor_ms, 2),
                          "impossible": bool(t_ms < floor_ms * 0.95)}
    out_rows["full_step_ms"] = round(dt * 1e3, 1)
    print(json.dumps(out_rows))


if __name__ == "__main__":
    main()
