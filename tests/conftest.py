"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; all sharding/collective tests
run against `--xla_force_host_platform_device_count=8` fake CPU devices,
which exercises the same SPMD partitioner XLA uses on a real slice.
"""

import os

# Must be set before jax is imported anywhere. Override unconditionally:
# the ambient environment may pin a TPU platform, but unit tests must run
# on the virtual CPU mesh (and with exact f32 convolutions).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# f32 matmuls on CPU are exact; keep x64 off to match TPU numerics.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize registers the TPU backend at interpreter
# start, overriding JAX_PLATFORMS from the env; the config update still wins
# as long as no computation has run yet.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is compile-bound (CPU XLA
# compiles of GAN steps / streaming scans dominate wall time), and the
# cache works for the CPU backend too — warm reruns skip most of it.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("HILCODEC_TEST_CACHE", "/tmp/hilcodec_tpu_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Heavy integration tests (full-size models, torch-oracle transplants,
# megakernel compiles, CLI subprocesses) — centrally marked slow so the
# default `-m "not slow"` tier stays a quick unit/parity loop on a
# single-core box. The full suite runs them all.
_SLOW_NODES = {
    "test_train_step.py::test_warmup_lr_schedule",
    "test_train_step.py::test_d_nonfinite_guard",
    "test_train_step.py::test_fam_mode_joint_falls_back_with_update_ratio",
    "test_train_step.py::test_train_step_runs_and_updates",
    "test_train_step.py::test_novq_trainer_step",
    "test_export.py::test_export_cli_avocodo_family",
    "test_export.py::test_export_cli_writes_reference_cache_layout",
    "test_export.py::test_stablehlo_export_roundtrip",
    "test_discriminators.py::test_mpd_msd_forward",
    "test_codec_api.py::test_offline_roundtrip_shapes",
    "test_codec_api.py::test_stream_block_sizes_agree",
    "test_pallas_encoder.py::test_encoder_megakernel_matches_scan",
    "test_pallas_encoder.py::test_encode_stream_megakernel_token_parity",
    "test_pallas_decoder.py::test_megakernel_step_matches_scan_decoder",
    "test_pallas_decoder.py::test_decode_stream_megakernel_matches_scan",
    "test_pallas_rvq.py::test_streaming_encode_with_pallas_kernel_matches_scan",
    "test_registry.py::test_vq_config_routing",
    "test_registry.py::test_build_encodec_full_codec_stream",
    "test_hilcodec_model.py::test_fold_params_preserves_forward",
    "test_hilcodec_model.py::test_encoder_batch_stream_equivalence",
    "test_hilcodec_model.py::test_decoder_batch_stream_equivalence",
    "test_hilcodec_model.py::test_encoder_l2norm_output_scale",
    "test_torch_model_parity.py::test_hilcodec_encoder_batch_parity",
    "test_torch_model_parity.py::test_hilcodec_decoder_batch_parity",
    "test_torch_model_parity.py::test_hilcodec_streaming_parity",
    "test_torch_model_parity.py::test_encodec_seanet_lstm_parity",
    "test_audiodec.py::test_hop_and_shapes",
    "test_audiodec.py::test_encoder_stream_equals_batch",
    "test_audiodec.py::test_decoder_stream_equals_batch",
    "test_encodec.py::test_encodec_forward_shapes",
    "test_encodec.py::test_reflect_pad_mode_differs_only_at_start",
    "test_encodec.py::test_lm_training_reduces_entropy",
    "test_encodec.py::test_lm_model",
    "test_encodec.py::test_streaming_transformer_state_carry",
    "test_encodec.py::test_encodec_stream_equals_batch",
    "test_train_loop.py::test_pesq_epoch_stoi",
    "test_parallel.py::test_stream_sharded_serving_parity",
    "test_summarize.py::test_summarize_writes_event_file",
    "test_avocodo.py::test_multiscale_outputs",
    "test_avocodo.py::test_decoder_stream_equals_batch_full_rate",
    "test_avocodo_trainer.py::test_avocodo_codec_forward_single_scale",
    "test_avocodo_torch_parity.py::test_avocodo_generator_forward_parity",
    "test_avocodo_torch_parity.py::test_avocodo_discriminator_parity",
    "test_shape_gain.py::test_shape_gain_train_step_updates",
    "test_shape_gain.py::test_residual_shape_gain_vq",
    "test_shape_gain.py::test_shape_gain_quantize_reconstruction",
    "test_entropy_coding.py::test_lm_causal_bitwise_independence",
    "test_rvq.py::test_dropout_masks_inactive_stages",
    "test_rvq.py::test_expiry_replaces_dead_codes",
    "test_stft.py::test_istft_roundtrip",
    "test_flops_oracle.py::test_analytic_counter_matches_torch_hooks",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = (os.path.basename(str(item.fspath)) + "::"
               + item.name.split("[")[0])
        if key in _SLOW_NODES:
            item.add_marker(pytest.mark.slow)


REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference repo not mounted")
    return REFERENCE_DIR


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
