"""Test harness: 8 virtual CPU devices (the multi-chip stand-in).

Must set env before any jax import (SURVEY.md §4: the TPU-native analog
of testing multi-node without a cluster).
"""

import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# Isolate the persistent compile cache per test run: CLI-driving tests
# call setup_compilation_cache(), and sharing ~/.cache/mdd_tpu/xla with
# a concurrently-running TPU job has produced a native crash in the
# cache writer (observed: segfault in put_executable_and_time while the
# bench process wrote the same directory).  A throwaway dir keeps the
# coverage and removes the cross-process collision.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      tempfile.mkdtemp(prefix="mdd_test_xla_cache_"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Env alone is not enough on axon-tunnel hosts: the axon sitecustomize
# registers the remote-TPU backend at interpreter boot and pins
# jax_platforms="axon,cpu", silently routing every "CPU" test through the
# tunnel (one remote compile per jit).  Re-pin to cpu programmatically,
# and use jax_num_cpu_devices (the XLA_FLAGS route is ignored once the
# CPU client exists).
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)


# ---------------------------------------------------------------------------
# two-tier suite: `pytest -m "not slow"` is the quick iteration tier.
# Centralized duration-derived list (from a full-suite --durations run on
# the 1-core CI host; contended times ÷4 ≈ true cost) instead of
# per-file decorators; tests may also self-mark with @pytest.mark.slow.
# Node-id PREFIX match so parametrized variants are covered.
# ---------------------------------------------------------------------------

_SLOW_PREFIXES = (
    "test_fused_jvp.py::test_distill_meta_grad_parity_nf_tiny",
    "test_fused_jvp.py::test_fused_jvp_gspmd_sharded_step",
    "test_reference_parity.py::test_reference_step_parity_nfnet",
    "test_s2d_stem.py::test_s2d_stem_gspmd_sharded_step",
    "test_s2d_stem.py::test_distill_step_with_s2d_stem",
    "test_s2d_stem.py::test_other_stem_model_parity",
    "test_pallas_gconv.py::test_distill_step_with_primitive_enabled",
    "test_launch_fixture.py::",
    "test_shard_syn.py::test_shard_syn_meta_gradient_parity",
    "test_shard_syn.py::test_shard_syn_step_matches_unsharded",
    "test_distill.py::test_hvp_forward_matches_reverse",
    "test_distill.py::test_meta_gradient_finite_difference",
    "test_distill.py::test_hvp_forward_finite_difference",
    "test_distill.py::test_carry_tree_matches_flat",
    "test_distill.py::test_fr_bwd_for_matches_rof",
    "test_distill.py::test_remat_group_matches_plain",
    "test_distill.py::test_remat_matches_no_remat",
    "test_distill.py::test_bfloat16_inner_mode_runs_and_tracks_f32",
    "test_distill.py::test_single_modality_distillation",
    "test_import_torch.py::test_nfnet_l0_roundtrip",
    "test_import_torch.py::test_load_image_tower_weights_replaces_backbone",
    "test_end_to_end.py::test_full_pipeline",
    "test_end_to_end.py::test_generic_timm_ckpt_env_ignored",
    "test_end_to_end.py::test_nan_bailout_stops_loop",
    "test_real_annotations.py::",
    "test_multiprocess.py::",
    "test_transfer_eval.py::test_eval_distilled_cross_tower",
    "test_real_format_import.py::test_nf_family_import",
    "test_real_format_import.py::test_bert_import_from_real_hf_model",
    "test_models.py::test_nfnet_l0_stateless_and_shape",
    "test_models.py::test_convnext_tower",
    "test_models.py::test_modified_resnet_attnpool",
    "test_parallel_eval.py::test_parallel_eval_under_mesh",
    "test_parallel_experts.py::test_parallel_matches_sequential",
    "test_randaugment_device.py::test_device_augment_trainer_path",
    "test_sharding.py::test_graft_entry_single",
    "test_sharding.py::test_bi_encoder_trainer_mesh_parity",
    "test_torch_order.py::test_nfnet_reference_buffer_loads_bit_exact",
    "test_nfnet_torch_mirror.py::",
    "test_checkpoint.py::test_distill_checkpoint_roundtrip",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid.split("/")[-1]  # strip tests/ prefix
        if any(nid.startswith(p) for p in _SLOW_PREFIXES):
            item.add_marker(pytest.mark.slow)
