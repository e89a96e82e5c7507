"""streaming_roofline.py contract tests (CPU; slow).

The roofline script produces the BASELINE round-4 floor table for the
headline streaming program; this pins its JSON contract (analytic mode)
and the conv-signature collection that feeds the measured shape floor.
"""
import json
import runpy
import sys

import pytest

pytestmark = pytest.mark.slow


def test_roofline_analytic_contract(monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv",
                        ["streaming_roofline.py", "8",
                         "--seconds", "0.0134", "--analytic-only"])
    runpy.run_path("scripts/streaming_roofline.py", run_name="__main__")
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1
    row = json.loads(lines[0])
    # analytic floors must be present and ordered sanely
    assert row["n_frames"] == 1
    assert row["mxu_flops_per_frame"] > 1e9
    assert 0 < row["hbm_floor_us"] < row["frame_budget_us"]
    assert 0 < row["mxu_floor_us"] < row["frame_budget_us"]
    # elementwise FLOPs are ~2% of MXU FLOPs on this model family
    assert row["elem_flops_per_frame"] < 0.1 * row["mxu_flops_per_frame"]


def test_conv_signature_collection():
    """The frame program's conv census: 107 instances over ~43 unique
    signatures at any stream count (counts are per frame and independent
    of batch)."""
    import jax
    sys.path.insert(0, ".")
    sys.path.insert(0, "scripts")
    import streaming_roofline as srl

    (_m, _p, _v, enc_dec, wav, ce, cd,
     n_frames) = srl.build(4, 0.0134, "f32", False)
    assert n_frames == 1
    sigs = {}
    srl.collect_conv_signatures(
        jax.make_jaxpr(enc_dec)(wav, ce, cd).jaxpr, sigs)
    assert sum(sigs.values()) == 107
    assert len(sigs) >= 40
    for (lshape, _ldt, _rshape, *_rest), _count in sigs.items():
        assert lshape[0] == 4          # stream dim reaches every conv
