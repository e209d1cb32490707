"""MoE routing under a TRAINED (non-uniform) router (VERDICT r4 #8).

The round-4 capacity-factor x top-k sweep (docs/BENCHMARKS.md) used a
random-init router, whose softmax load is near-uniform — the best case
for capacity sizing. This drive produces the companion column: the
dropped-token fraction when the router has actually been TRAINED (MLM on
Zipfian synthetic text, standard Switch aux loss), where expert loads
skew and drops at a given capacity factor grow.

Two modes:
  --train  (CPU mesh)  Train the E=8 MiniLM-geometry MoE with
           make_mlm_train_step until the router load stabilizes; save the
           checkpoint under .bench_cache/moe_router_ckpt/ and print the
           per-(top_k, cf) drop table trained-vs-random at a small eval
           shape.
  --sweep  (TPU)       Load the trained checkpoint and re-run the r4
           sweep shape (b=1024, s=128): sent/s + moe_drop per
           (top_k, cf), trained router vs random init, same data.

Reference frame: EP as a first-class axis (SURVEY §2.2); the drop metric
is ops/moe.router_topk's dropped-token fraction.

Train:  python -u drives/moe_router_skew.py --train [--steps 300]
Sweep:  python -u drives/moe_router_skew.py --sweep
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(row):
    print(json.dumps(row), flush=True)


CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache", "moe_router_ckpt")
VOCAB = 8192
SPECIALS = (0, 1, 2, 3, 4)
MASK_ID = 4
SWEEP = [(1, 1.0), (1, 1.25), (1, 2.0), (2, 1.0), (2, 1.25), (2, 2.0)]


def make_arch():
    from text_similarity_tpu.core.config import ARCH_PRESETS

    return ARCH_PRESETS["minilm-l6"].replace(
        vocab_size=VOCAB, num_experts=8, expert_top_k=2,
        expert_capacity_factor=1.25,
    )


def zipf_batch(rng, b, s):
    """Zipfian token ids (exponent ~1.1, the shape of real text) with
    variable lengths 16..s — structured input the router can specialize
    on; uniform-random tokens would leave nothing to learn."""
    ranks = np.arange(1, VOCAB - len(SPECIALS) + 1, dtype=np.float64)
    p = 1.0 / ranks**1.1
    p /= p.sum()
    ids = rng.choice(VOCAB - len(SPECIALS), size=(b, s), p=p) + len(SPECIALS)
    lens = rng.integers(16, s + 1, size=b)
    mask = (np.arange(s)[None, :] < lens[:, None]).astype(np.int32)
    ids = np.where(mask > 0, ids, 0)
    ids[:, 0] = 2  # [CLS]-like anchor
    return ids.astype(np.int32), mask


def drop_table(params, arch, batches, precision, timing=False):
    """moe_drop (and optionally sent/s) per (top_k, cf) on the given
    batches with the given params."""
    import jax.numpy as jnp

    from text_similarity_tpu.models.encoder import encoder_forward

    rows = []
    for top_k, cf in SWEEP:
        a = arch.replace(expert_top_k=top_k, expert_capacity_factor=cf)

        @jax.jit
        def fwd(p, ids, mask, _a=a):
            out = encoder_forward(p, ids, mask, arch=_a,
                                  precision=precision)
            return out.moe_aux, out.moe_drop

        drops, auxs = [], []
        for ids, mask in batches:
            x, d = fwd(params, jnp.asarray(ids), jnp.asarray(mask))
            auxs.append(float(x))
            drops.append(float(d))
        row = {"top_k": top_k, "cf": cf,
               "moe_drop": round(float(np.mean(drops)), 4),
               "moe_aux": round(float(np.mean(auxs)), 4)}
        if timing:
            ids, mask = batches[0]
            ids, mask = jnp.asarray(ids), jnp.asarray(mask)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                outs = [fwd(params, ids, mask) for _ in range(5)]
                float(outs[-1][1])
                best = min(best, (time.time() - t0) / 5)
            row["sent_per_s"] = round(ids.shape[0] / best, 1)
        rows.append(row)
        log(f"top{top_k} cf={cf}: {row}")
    return rows


def cmd_train(steps, b=16, s=64):
    jax.config.update("jax_platforms", "cpu")
    from text_similarity_tpu.core.cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp

    from text_similarity_tpu.core.config import TrainConfig
    from text_similarity_tpu.core.checkpoint import save_checkpoint
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.models import init_params
    from text_similarity_tpu.train import make_optimizer
    from text_similarity_tpu.train.steps import (
        make_mlm_train_step, init_train_state,
    )

    arch = make_arch()
    params = {
        "encoder": init_params(jax.random.PRNGKey(0), arch),
        "mlm_bias": jnp.zeros((arch.vocab_size,), jnp.float32),
    }
    cfg = TrainConfig(lr=3e-4, batch_size=b, max_seq_len=s)
    tx = make_optimizer(cfg, steps, params_example=params)
    state = init_train_state(params, tx, seed=0)
    step = make_mlm_train_step(
        arch, tx, mask_token_id=MASK_ID, special_ids=SPECIALS,
        precision=FP32_PRECISION,
    )
    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(steps):
        ids, mask = zipf_batch(rng, b, s)
        state, m = step(state, {"ids": jnp.asarray(ids),
                                "mask": jnp.asarray(mask)})
        if i % 25 == 0 or i == steps - 1:
            log(f"step {i}: loss={float(m['loss']):.4f} "
                f"aux={float(m['moe_aux']):.4f} "
                f"drop={float(m['moe_drop']):.4f} "
                f"({(time.time() - t0) / (i + 1):.2f}s/step)")
    save_checkpoint(CKPT, state.params, step=steps,
                    meta={"arch": "minilm-l6+E8", "vocab": VOCAB,
                          "data": "zipf-1.1 mlm"})
    log(f"checkpoint saved under {CKPT}")

    # small-shape preview table (the HW sweep at b=1024 s=128 is the
    # table of record — drop shrinks with token count at fixed cf)
    eval_batches = [zipf_batch(rng, 64, 128) for _ in range(4)]
    log("trained router:")
    tr = drop_table(state.params["encoder"], arch,
                    eval_batches, FP32_PRECISION)
    log("random-init router (same data):")
    rn = drop_table(init_params(jax.random.PRNGKey(7), arch), arch,
                    eval_batches, FP32_PRECISION)
    emit({"mode": "train", "steps": steps, "eval_shape": [64, 128],
          "trained": tr, "random": rn})


def cmd_sweep(b=1024, s=128):
    from text_similarity_tpu.core.cache import setup_compile_cache

    setup_compile_cache()
    from text_similarity_tpu.core.checkpoint import (
        latest_checkpoint, restore_checkpoint,
    )
    from text_similarity_tpu.core.precision import precision_for
    from text_similarity_tpu.models import init_params

    arch = make_arch()
    ck = latest_checkpoint(CKPT)
    if ck is None:
        raise SystemExit(f"no checkpoint under {CKPT}; run --train first")
    template = {"encoder": init_params(jax.random.PRNGKey(0), arch)}
    import jax.numpy as jnp

    template["mlm_bias"] = jnp.zeros((arch.vocab_size,), jnp.float32)
    params, _, tstep, _ = restore_checkpoint(ck, template)
    log(f"restored {ck} (step {tstep})")

    rng = np.random.default_rng(1)
    batches = [zipf_batch(rng, b, s) for _ in range(4)]
    prec = precision_for(True)
    log("trained router (HW shape):")
    tr = drop_table(params["encoder"], arch, batches, prec, timing=True)
    log("random-init router (same data):")
    rn = drop_table(init_params(jax.random.PRNGKey(7), arch), arch,
                    batches, prec, timing=True)
    emit({"mode": "sweep", "shape": [b, s], "trained": tr, "random": rn})


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()
    if args.train:
        cmd_train(args.steps)
    elif args.sweep:
        cmd_sweep()
    else:
        raise SystemExit("pass --train or --sweep")
