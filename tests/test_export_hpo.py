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
        load_exported_params,
    )

    arch = ARCH_PRESETS["tiny-test"]
    params = init_params(jax.random.PRNGKey(0), arch)
    enc = SentenceEncoder(params, arch, precision=FP32_PRECISION)
    manifest = export_encoder_stablehlo(
        enc, str(tmp_path), batch_sizes=(2,), seq_lens=(16,), quantize=True
    )
    assert len(manifest["functions"]) == 1
    assert manifest["int8"]
    # the server flow: restore the SHIPPED params (int8 {q,s} leaves,
    # template-free) and call the exported fn with them — the fn is
    # traced on exactly that tree
    fn = load_exported_fn(str(tmp_path), manifest["functions"][0]["name"])
    shipped = load_exported_params(str(tmp_path))
    ids = jnp.asarray(
        np.random.RandomState(0).randint(5, arch.vocab_size, (2, 16)), jnp.int32
    )
    mask = jnp.ones((2, 16), jnp.int32)
    got = np.asarray(fn(shipped, ids, mask))
    want = np.asarray(enc.embed_tokens(ids, mask))
    # int8 quantization noise: directions must agree to cosine > 0.99
    cos = np.sum(got * want, axis=1)
    assert cos.min() > 0.99, cos


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


def test_tpe_adaptive_beats_random_on_quadratic():
    """TPE should concentrate samples near the optimum of a smooth bowl
    and beat random search at equal trial budget (seeded, deterministic)."""
    from text_similarity_tpu.train.hpo import (
        AdaptiveParamOptimizer, ParamOptimizer, SearchSpace,
    )

    space = SearchSpace({
        "x": ("uniform", -5.0, 5.0),
        "lr": ("loguniform", 1e-5, 1e-1),
        "kind": ("choice", ["a", "b"]),
    })

    def objective(p):
        bonus = 1.0 if p["kind"] == "a" else 0.0
        import math
        return -(p["x"] - 1.5) ** 2 - (math.log10(p["lr"]) + 3) ** 2 + bonus

    tpe = AdaptiveParamOptimizer(objective, space, direction="max", seed=0)
    r_tpe = tpe.optimize(n_trials=40)
    rnd = ParamOptimizer(objective, space, direction="max", seed=0)
    r_rnd = rnd.optimize(n_trials=40, method="random")
    assert r_tpe["best_value"] >= r_rnd["best_value"] - 0.3
    # the adaptive best should be close to the true optimum (value 1.0)
    assert r_tpe["best_value"] > 0.0, r_tpe["best_value"]


def test_median_pruner_stops_bad_trials():
    from text_similarity_tpu.train.hpo import (
        AdaptiveParamOptimizer, SearchSpace,
    )

    space = SearchSpace({"q": ("uniform", 0.0, 1.0)})
    calls = {"steps": 0}

    def objective(p, report):
        # trials with low q are uniformly worse at every step
        for step in range(5):
            calls["steps"] += 1
            report(step, p["q"] * (step + 1))
        return p["q"] * 5

    opt = AdaptiveParamOptimizer(objective, space, direction="max", seed=1)
    res = opt.optimize(n_trials=20)
    assert res["n_pruned"] > 0          # bad trials actually stop early
    assert res["best_value"] is not None
    # pruning saved steps: < 20 trials x 5 steps
    assert calls["steps"] < 100
