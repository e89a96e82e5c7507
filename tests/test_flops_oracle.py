"""MFU external anchor (VERDICT r4 item 6): the analytic jaxpr FLOP counter
that bench.py divides by wall time must agree with an independent
torch-hook MAC count of the reference generator
(/root/reference/models/hilcodec/models.py, speech config, n=8).

If this drifts, every MFU/TFLOP-s claim in BASELINE.md drifts with it."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree not mounted")
def test_analytic_counter_matches_torch_hooks():
    from flops_oracle import (analytic_gflops_per_audio_s,
                              torch_reference_gflops_per_audio_s)
    torch_g = torch_reference_gflops_per_audio_s()
    analytic_g = analytic_gflops_per_audio_s()
    # the two models are independent implementations of the same topology;
    # 10% headroom covers layout/padding edge differences
    assert abs(analytic_g - torch_g) / torch_g < 0.10, (analytic_g, torch_g)
    # sanity on absolute scale (the r2 "0.1% MFU" bug was a 300x error)
    assert 20.0 < torch_g < 60.0
