"""Analytic FLOP/byte accounting for the compiled train step (or any jit
function) by walking its jaxpr — correct for grouped/depthwise convs.

XLA's `compiled.cost_analysis()` dense-counts grouped convolutions on this
backend (BASELINE.md round-3 caveat: the generator forward gets assigned
827 GFLOP while measuring 1.2-1.8 ms), so MFU derived from it is an upper
bound on counted work, not an achieved-hardware fraction. This script
derives the true algorithmic work instead:

  conv_general_dilated: 2 * prod(out_shape) * (Cin/groups) * prod(k)
  dot_general:          2 * prod(batch+lhs_contract+out free dims)
  everything else:      elementwise_flops ~= prod(out_shape) (reported
                        separately; reductions counted the same way)

Bytes are the sum of operand + result sizes per op (an upper bound on HBM
traffic: fusion keeps most intermediates in registers/VMEM, so the true
number is lower; weights/activations that are read once dominate).

Usage:
  python scripts/flops_analysis.py [bf16|f32] [batch]   # train step
Prints a JSON summary + the top ops by FLOPs.
"""
import dataclasses
import json
import sys

sys.path.insert(0, ".")


def _size(aval):
    n = 1
    for d in aval.shape:
        n *= d
    return n


def _bytes(aval):
    return _size(aval) * aval.dtype.itemsize


def analyze_jaxpr(jaxpr, rows, scale=1):
    """Accumulate (flops, bytes) rows per primitive instance, recursing
    into sub-jaxprs. `scale` multiplies counts inside scans (trip count)."""
    from jax import core as jcore  # noqa: F401  (version-stable import)

    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        params = eqn.params
        if prim in ("scan", "while", "cond", "pjit", "jit",
                    "custom_vjp_call", "custom_jvp_call", "remat",
                    "checkpoint", "custom_vjp_call_jaxpr", "closed_call",
                    "core_call", "xla_call", "shard_map"):
            sub = None
            inner_scale = scale
            if prim == "scan":
                sub = params["jaxpr"].jaxpr
                inner_scale = scale * params["length"]
            elif prim == "cond":
                subs = params["branches"]
                for s in subs:
                    analyze_jaxpr(s.jaxpr, rows, scale)
                continue
            elif prim == "while":
                analyze_jaxpr(params["body_jaxpr"].jaxpr, rows, scale)
                continue
            else:
                cj = params.get("jaxpr") or params.get("call_jaxpr") \
                    or params.get("fun_jaxpr")
                sub = cj.jaxpr if hasattr(cj, "jaxpr") else cj
            if sub is not None:
                analyze_jaxpr(sub, rows, inner_scale)
            continue

        out_avals = [v.aval for v in eqn.outvars]
        in_avals = [v.aval for v in eqn.invars if hasattr(v, "aval")]
        byts = sum(map(_bytes, in_avals)) + sum(map(_bytes, out_avals))

        if prim == "conv_general_dilated":
            lhs, rhs = in_avals[0], in_avals[1]
            out = out_avals[0]
            g = params["feature_group_count"] * params["batch_group_count"]
            dn = params["dimension_numbers"]
            k_spatial = 1
            for d in dn.rhs_spec[2:]:
                k_spatial *= rhs.shape[d]
            cin_per_g = rhs.shape[dn.rhs_spec[1]]
            flops = 2 * _size(out) * cin_per_g * k_spatial
            rows.append((prim, flops * scale, byts * scale,
                         f"lhs{tuple(lhs.shape)} rhs{tuple(rhs.shape)} "
                         f"g={g} -> {tuple(out.shape)}"))
        elif prim == "dot_general":
            lhs = in_avals[0]
            out = out_avals[0]
            dn = params["dimension_numbers"]
            contract = 1
            for d in dn[0][0]:
                contract *= lhs.shape[d]
            flops = 2 * _size(out) * contract
            rows.append((prim, flops * scale, byts * scale,
                         f"lhs{tuple(lhs.shape)} -> {tuple(out.shape)}"))
        else:
            flops = sum(map(_size, out_avals))
            desc = " ".join(f"{tuple(a.shape)}:{a.dtype.name}"
                            for a in (in_avals[:3] + out_avals[:1]))
            rows.append((prim, flops * scale, byts * scale, desc))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hilcodec_tpu.train.loop import build_trainer
    from hilcodec_tpu.utils.hparams import load_config

    hps = load_config("configs/hilcodec_speech_synth.yaml")
    trainer = build_trainer(hps)
    if which == "bf16":
        trainer = dataclasses.replace(trainer, compute_dtype=jnp.bfloat16)
    state = trainer.init_state(jax.random.PRNGKey(0))
    seg = hps.data.get("segment_size", 24000)
    wav = jnp.zeros((batch, 1, seg), jnp.float32)
    key = jax.random.PRNGKey(1)

    jaxpr = jax.make_jaxpr(trainer.train_step)(state, wav, key)
    rows = []
    analyze_jaxpr(jaxpr.jaxpr, rows)

    conv_f = sum(f for p, f, b, _ in rows if p == "conv_general_dilated")
    dot_f = sum(f for p, f, b, _ in rows if p == "dot_general")
    elem_f = sum(f for p, f, b, _ in rows
                 if p not in ("conv_general_dilated", "dot_general"))
    tot_b = sum(b for _, _, b, _ in rows)
    n_conv = sum(1 for p, *_ in rows if p == "conv_general_dilated")
    print(json.dumps({
        "dtype": which, "batch": batch,
        "conv_tflop": round(conv_f / 1e12, 3),
        "dot_tflop": round(dot_f / 1e12, 3),
        "elementwise_gflop_proxy": round(elem_f / 1e9, 1),
        "n_conv_ops": n_conv,
        "sum_operand_bytes_gb": round(tot_b / 1e9, 2),
        "v5e_mxu_floor_ms_bf16": round(
            (conv_f + dot_f) / 197e12 * 1e3, 2),
        "v5e_hbm_floor_ms_at_819GBps": round(tot_b / 819e9 * 1e3, 2),
    }))
    # category split: disc 2D convs (4-D lhs) vs 1-D convs by groupedness
    cats = {}
    for p, f, b, desc in rows:
        if p != "conv_general_dilated":
            continue
        is2d = desc.count(",") >= 6 and "lhs(24, " in desc  # 4-D lhs
        grouped = "g=1 " not in desc
        key = ("conv2d" if "rhs" in desc and desc.split("rhs")[1].count(
            ",") >= 3 else "conv1d")
        key += "_grouped" if grouped else "_dense"
        c = cats.setdefault(key, [0, 0, 0])
        c[0] += f
        c[1] += b
        c[2] += 1
    print(json.dumps({k: {"tflop": round(v[0] / 1e12, 3),
                          "gb": round(v[1] / 1e9, 2), "n": v[2]}
                      for k, v in sorted(cats.items())}))
    convs = sorted((r for r in rows if r[0] == "conv_general_dilated"),
                   key=lambda r: -r[1])[:15]
    for p, f, b, desc in convs:
        print(f"{f/1e9:10.2f} GF {b/1e6:9.1f} MB  {desc}")
    heavy = sorted((r for r in rows if r[0] != "conv_general_dilated"),
                   key=lambda r: -r[2])[:8]
    print("-- top non-conv by bytes --")
    for p, f, b, desc in heavy:
        print(f"{f/1e9:10.2f} GF {b/1e6:9.1f} MB  {p} {desc}")


if __name__ == "__main__":
    main()
