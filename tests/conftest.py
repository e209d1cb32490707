"""Test config: force an 8-device CPU platform so sharding/collective code
paths run without TPU hardware — the TPU-world equivalent of a fake backend
(SURVEY.md §4).

Note: this environment's sitecustomize pins JAX_PLATFORMS=axon (remote TPU
tunnel), so the env var alone is not enough — we must also set the jax
config after import."""

import os

# Must be set before the backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Compile cache: CPU platforms get NO persistent cache (core/cache.py) —
# CPU AOT executables are host-specific (r3: foreign-host SIGILL from the
# shipped cache) and even same-host cross-process reuse aborted a full
# pytest run (r4, 2026-08-19). CPU compiles are cheap.
from text_similarity_tpu.core.cache import setup_compile_cache  # noqa: E402

_cache_dir = setup_compile_cache()
assert _cache_dir is None or ".jax_cache" not in _cache_dir

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    assert jax.device_count() == 8
    return jax.devices()


# ---------------------------------------------------------------------------
# fast tier: `pytest -m fast` — a <5-minute smoke subset, one or two
# cheap-but-representative tests per subsystem (VERDICT r4 #6). The full
# suite remains the land gate; this is the developer loop.
# ---------------------------------------------------------------------------

FAST_TESTS = {
    "test_attention.py::test_flash_matches_reference_full_mask",
    "test_attention.py::test_packed_attention_matches_reference",
    "test_cache.py::test_cpu_platform_gets_no_persistent_cache",
    "test_cli.py::test_cli_search_and_mine",
    "test_compress.py::test_extract_student_layers",
    "test_compress.py::test_int8_quantization_roundtrip",
    "test_data.py::test_wordpiece_roundtrip_known_words",
    "test_data.py::test_encode_pair_batch_types",
    "test_datasets.py::test_load_sts",
    "test_datasets.py::test_build_pair_batches_bi",
    "test_encoder.py::test_bert_parity_with_hf",
    "test_export_hpo.py::test_stablehlo_export_roundtrip",
    "test_index.py::test_ivf_recall_vs_brute_force",
    "test_index.py::test_ivf_incremental_add",
    "test_lexicon.py::test_json_roundtrip",
    "test_long_context.py::test_performer_approximates_softmax",
    "test_long_context.py::test_ring_attention_matches_single_device",
    "test_meters.py::test_similarity_metrics_match_scipy",
    "test_misc_ops.py::test_activations",
    "test_misc_ops.py::test_ner_step_loss_decreases",
    "test_moe.py::test_router_matches_numpy_oracle",
    "test_moe.py::test_moe_e1_equals_dense_ffn",
    "test_native_wordpiece.py::test_native_matches_python",
    "test_packed_train.py::test_packed_bi_step_matches_dense[cosine_mse]",
    "test_packing.py::test_pack_sequences_layout",
    "test_packing.py::test_packed_embeddings_match_unpacked",
    "test_pipeline_parallel.py::test_pp_forward_matches_plain",
    "test_pipelines.py::test_search_pipeline_self_retrieval",
    "test_pipelines.py::test_search_server_end_to_end",
    "test_sharded_index.py::test_sharded_ivf_recall",
    "test_topk.py::test_pallas_topk_matches_numpy",
    "test_trainer.py::test_trainer_saves_best_and_results",
    "test_trainer.py::test_grad_accumulation_matches_large_batch",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("/")[-1]
        if rel in FAST_TESTS:
            item.add_marker(pytest.mark.fast)
