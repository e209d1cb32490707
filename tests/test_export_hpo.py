"""StableHLO export round-trip + HPO search."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_similarity_tpu.core.config import ARCH_PRESETS
from text_similarity_tpu.core.precision import FP32_PRECISION
from text_similarity_tpu.models import init_params
from text_similarity_tpu.models.sentence_encoder import SentenceEncoder


def test_stablehlo_export_roundtrip(tmp_path):
    from text_similarity_tpu.compress.export import (
        export_encoder_stablehlo,
        load_exported_fn,
    )

    arch = ARCH_PRESETS["tiny-test"]
    params = init_params(jax.random.PRNGKey(0), arch)
    enc = SentenceEncoder(params, arch, precision=FP32_PRECISION)
    manifest = export_encoder_stablehlo(
        enc, str(tmp_path), batch_sizes=(2,), seq_lens=(16,), quantize=True
    )
    assert len(manifest["functions"]) == 1
    fn = load_exported_fn(str(tmp_path), manifest["functions"][0]["name"])
    ids = jnp.asarray(
        np.random.RandomState(0).randint(5, arch.vocab_size, (2, 16)), jnp.int32
    )
    mask = jnp.ones((2, 16), jnp.int32)
    got = np.asarray(fn(params, ids, mask))
    want = np.asarray(enc.embed_tokens(ids, mask))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hpo_random_and_grid():
    from text_similarity_tpu.train.hpo import ParamOptimizer, SearchSpace

    def objective(p):
        return -((p["lr"] - 3e-4) ** 2) - (p["layers"] - 4) ** 2

    space = SearchSpace({
        "lr": ("loguniform", 1e-5, 1e-2),
        "layers": ("choice", [2, 4, 6]),
    })
    res = ParamOptimizer(objective, space, direction="max").optimize(25)
    assert res["best_params"]["layers"] == 4
    assert len(res["trials"]) == 25

    grid_space = SearchSpace({
        "lr": ("choice", [1e-4, 3e-4]),
        "layers": ("choice", [2, 4]),
    })
    res = ParamOptimizer(objective, grid_space, direction="max").optimize(
        10, method="grid"
    )
    assert res["best_params"] == {"lr": 3e-4, "layers": 4}
