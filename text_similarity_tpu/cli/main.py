"""Unified CLI: ``python -m text_similarity_tpu.cli <command>``.

One entry point with subcommands replacing the reference's per-task script
zoo (every ``if __name__ == "__main__"`` + argparse under src/training,
src/evaluation, src/compression, src/pipeline — SURVEY.md §2.3 "CLI" row):

  train-sts            ← src/training/train_sts.py
  train-nli            ← src/training/train_nli.py
  train-paws           ← src/training/train_paws.py (+ quora via --format)
  train-classification ← src/training/train_classification.py
  train-wic            ← src/training/train_wic.py
  train-ner            ← src/training/train_ner.py
  distill              ← src/compression/distill.py + make_multilingual.py
  theseus              ← src/compression/distill_paws.py / distill_theseus
  prune                ← src/compression/prune.py
  quantize / export    ← convert_to_onnx.py / quantize (TPU-native bundle)
  eval-sts             ← src/evaluation/eval_sts.py
  eval-paws            ← src/evaluation/eval_pawsx.py
  eval-tatoeba         ← src/evaluation/eval_tatoeba.py
  search               ← src/evaluation/eval_semantic_search.py
  mine                 ← src/evaluation/eval_sentence_mining.py
  cluster / topics     ← src/pipeline/clustering.py / topic_modeling.py
  pretrain-long        ← src/scripts/make_long_transformer.py
  eval-classification  ← src/evaluation/eval_document_classifier.py
  (benchmarks: python bench.py at the repo root)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _jax():
    import jax

    # persistent compile cache, anchored to the package dir (not the cwd)
    # and fingerprinted by platform/host so CPU runs on another machine
    # never load this host's CPU executables (SIGILL — core/cache.py)
    from ..core.cache import setup_compile_cache

    setup_compile_cache()
    return jax


def _tokenizer(args, texts=None):
    from ..data.tokenization import WordPieceTokenizer, load_tokenizer, train_wordpiece_vocab

    if getattr(args, "tokenizer", None):
        return load_tokenizer(args.tokenizer)
    if texts is None:
        raise SystemExit("--tokenizer required (no training texts to fit one)")
    vocab = train_wordpiece_vocab(texts, vocab_size=args.vocab_size)
    return WordPieceTokenizer(vocab)


def _encoder(args, tokenizer=None, texts=None):
    """Load a SentenceEncoder from --model dir, or init from --arch."""
    from ..models.sentence_encoder import SentenceEncoder

    if getattr(args, "model", None):
        if not os.path.isdir(args.model):
            # a typo'd path must NOT silently fall back to random init —
            # the user would "fine-tune" a from-scratch model unknowingly
            raise SystemExit(f"--model dir not found: {args.model!r}")
        return SentenceEncoder.load(args.model, bf16=not args.fp32)
    jax = _jax()
    from ..core.config import ARCH_PRESETS
    from ..core.precision import precision_for
    from ..models import init_params

    tok = tokenizer or _tokenizer(args, texts)
    arch = ARCH_PRESETS[args.arch].replace(vocab_size=tok.vocab_size)
    if getattr(args, "experts", 0):
        # MoE FFN with expert parallelism over the mesh "expert" axis
        # (ops/moe.py); only meaningful for random init — loaded models
        # carry their arch (incl. MoE) in the saved config.
        arch = arch.replace(
            num_experts=args.experts, expert_top_k=args.expert_top_k,
        )
    params = init_params(jax.random.PRNGKey(args.seed), arch)
    return SentenceEncoder(
        params, arch, tokenizer=tok, pooling=args.pooling or "mean",
        precision=precision_for(not args.fp32),
    )


def _common(p: argparse.ArgumentParser):
    p.add_argument("--model", help="model dir to load (else random init)")
    p.add_argument("--tokenizer", help="tokenizer dir (vocab.txt/tokenizer.json)")
    p.add_argument("--arch", default="minilm-l6")
    p.add_argument("--pooling", default=None,
                   choices=["mean", "cls", "max"],
                   help="default: the loaded model's pooling")
    p.add_argument("--vocab-size", type=int, default=30522)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--save-path", default="checkpoints/run")


def _train_common(p: argparse.ArgumentParser):
    _common(p)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-len", type=int, default=128)
    p.add_argument("--warmup-ratio", type=float, default=0.1)
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--pipe", type=int, default=1,
                   help="pipeline-parallel stages: shard the layer stack "
                        "over a pipe mesh axis (remaining devices go to "
                        "data parallelism)")
    p.add_argument("--experts", type=int, default=0,
                   help="MoE: replace each layer's dense FFN with N routed "
                        "experts (expert weights shard over the mesh "
                        "'expert' axis; random-init models only)")
    p.add_argument("--expert-top-k", type=int, default=2,
                   help="experts consulted per token (MoE routing)")
    p.add_argument("--packed", action="store_true",
                   help="sequence-packed training: pack several short "
                        "sentences per row behind a block-diagonal mask "
                        "(bi-encoder + cross-encoder objectives; MXU work "
                        "tracks real tokens instead of padded width)")
    p.add_argument("--packed-rows", type=int, default=32,
                   help="packed rows per tower per step (step batch is "
                        "whatever pair count packs into these rows)")


def _pp_mesh(args):
    """Mesh for --pipe N: N pipeline stages, leftover devices do DP."""
    if getattr(args, "pipe", 1) <= 1:
        return None
    from ..core.mesh import make_mesh

    return make_mesh(data=-1, pipe=args.pipe)


def _train_cfg(args):
    from ..core.config import TrainConfig

    return TrainConfig(
        lr=args.lr, epochs=args.epochs, batch_size=args.batch_size,
        warmup_ratio=args.warmup_ratio, grad_accum_steps=args.grad_accum,
        seed=args.seed, bf16=not args.fp32, max_seq_len=args.max_len,
    )


def _run_bi_encoder_training(args, pairs, targets, loss_type, eval_fn=None,
                             target_dtype=np.float32, encoder=None):
    jax = _jax()
    import jax.numpy as jnp

    from ..data.pairs import build_pair_batches, build_packed_pair_batches
    from ..train import (
        make_optimizer, make_bi_encoder_train_step,
        make_packed_bi_encoder_train_step, init_train_state,
    )
    from ..train.trainer import Trainer
    from ..core.precision import precision_for

    texts = [p[0] for p in pairs] + [p[1] for p in pairs]
    enc = encoder or _encoder(args, texts=texts)
    packed = getattr(args, "packed", False)
    if packed:
        if getattr(args, "pipe", 1) > 1:
            raise SystemExit("--packed and --pipe are mutually exclusive")
        batches = build_packed_pair_batches(
            enc.tokenizer, pairs, targets,
            rows_per_side=args.packed_rows, width=args.max_len,
            seed=args.seed, target_dtype=target_dtype,
        )
    else:
        batches = build_pair_batches(
            enc.tokenizer, pairs, targets, batch_size=args.batch_size,
            max_len=args.max_len, seed=args.seed, target_dtype=target_dtype,
        )
    cfg = _train_cfg(args)
    total = len(batches) * cfg.epochs
    params = {"encoder": enc.params}
    if loss_type == "softmax":
        from ..train.steps import init_classifier_head

        params["head"] = init_classifier_head(
            jax.random.PRNGKey(args.seed + 1),
            # embedding_size, not hidden_size: projection-head models
            # (dim-reduced students) emit narrower embeddings
            3 * enc.arch.embedding_size, args.num_classes,
        )
    tx = make_optimizer(cfg, total, params_example=params)
    state = init_train_state(params, tx, seed=args.seed)
    if packed:
        step = make_packed_bi_encoder_train_step(
            enc.arch, tx, loss_type=loss_type,
            pooling=args.pooling or enc.pooling,
            precision=precision_for(cfg.bf16),
        )
    else:
        step = make_bi_encoder_train_step(
            enc.arch, tx, loss_type=loss_type,
            # default to the LOADED encoder's pooling — training with a
            # different pooler than encode()/the saved artifact silently
            # mismatches the objective and the eval
            pooling=args.pooling or enc.pooling,
            precision=precision_for(cfg.bf16),
            pp_mesh=_pp_mesh(args),
        )
    trainer = Trainer(
        step, state, save_path=args.save_path, eval_fn=eval_fn,
        tracked_metric=getattr(args, "metric", "loss"),
        direction="max" if eval_fn else "min",
    )
    result = trainer.execute(
        lambda epoch: (jax.tree.map(jnp.asarray, b) for b in batches),
        epochs=cfg.epochs,
    )
    enc.params = result["state"].params["encoder"]
    enc.save(args.save_path)
    print(json.dumps({"best_metric": result["best_metric"]}))
    return enc, result


# ---------------------------------------------------------------------------
# commands
# ---------------------------------------------------------------------------

def cmd_train_sts(args):
    from ..data.datasets import load_sts
    from ..evaluation.evaluators import ParaphraseEvaluator

    rows = load_sts(args.data)
    pairs = [(a, b) for a, b, _ in rows]
    scores = [s for _, _, s in rows]
    eval_rows = load_sts(args.eval_data) if args.eval_data else None

    # encoder built up front so the eval closure can re-wrap the live
    # train-state params each epoch
    enc = _encoder(args, texts=[a for a, _ in pairs] + [b for _, b in pairs])

    def eval_fn(state):
        # params are jit ARGUMENTS — the compiled encode fns can be reused
        # across param updates, no cache clearing needed
        enc.params = state.params["encoder"]
        ev = ParaphraseEvaluator(enc, mode="regression")
        rows_ = eval_rows or rows[:512]
        out = ev.evaluate(
            [r[0] for r in rows_], [r[1] for r in rows_],
            [r[2] for r in rows_],
        )
        return out

    args.metric = "spearman_cosine"
    _run_bi_encoder_training(
        args, pairs, scores, "cosine_mse",
        eval_fn=eval_fn if not args.no_eval else None,
        encoder=enc,
    )


def cmd_train_nli(args):
    from ..data.datasets import load_nli

    rows = load_nli(args.data)
    args.num_classes = 3
    _run_bi_encoder_training(
        args, [(a, b) for a, b, _ in rows], [l for _, _, l in rows],
        "softmax", target_dtype=np.int32,
    )


def cmd_train_paws(args):
    from ..data.datasets import load_paws, load_quora

    rows = load_quora(args.data) if args.format == "quora" else load_paws(args.data)
    loss = args.loss
    _run_bi_encoder_training(
        args, [(a, b) for a, b, _ in rows], [l for _, _, l in rows],
        loss, target_dtype=np.float32,
    )


def cmd_train_classification(args):
    jax = _jax()
    import jax.numpy as jnp

    from ..data.datasets import load_documents_json
    from ..data.pairs import build_sequence_batches
    from ..train import (
        make_optimizer, make_classifier_train_step, init_train_state,
    )
    from ..train.steps import init_classifier_head
    from ..train.trainer import Trainer
    from ..core.precision import precision_for

    docs = load_documents_json(args.data, max_paragraph_words=args.paragraph_words)
    labels = sorted({d["label"] for d in docs})
    lab2id = {l: i for i, l in enumerate(labels)}
    texts = [d["text"] for d in docs]
    y = [lab2id[d["label"]] for d in docs]
    enc = _encoder(args, texts=texts)
    batches = build_sequence_batches(
        enc.tokenizer, texts, y, batch_size=args.batch_size,
        max_len=args.max_len, seed=args.seed,
    )
    cfg = _train_cfg(args)
    params = {
        "encoder": enc.params,
        "head": init_classifier_head(
            jax.random.PRNGKey(1), enc.arch.hidden_size, len(labels)
        ),
    }
    tx = make_optimizer(cfg, len(batches) * cfg.epochs, params_example=params)
    state = init_train_state(params, tx, seed=args.seed)
    step = make_classifier_train_step(
        enc.arch, tx, pooling="cls", precision=precision_for(cfg.bf16),
        pp_mesh=_pp_mesh(args),
    )
    trainer = Trainer(step, state, save_path=args.save_path)
    result = trainer.execute(
        lambda e: (jax.tree.map(jnp.asarray, b) for b in batches),
        epochs=cfg.epochs,
    )
    with open(os.path.join(args.save_path, "arch.json"), "w") as f:
        f.write(enc.arch.to_json())
    if hasattr(enc.tokenizer, "save_vocab"):
        enc.tokenizer.save_vocab(os.path.join(args.save_path, "vocab.txt"))
    with open(os.path.join(args.save_path, "labels.json"), "w") as f:
        json.dump(labels, f)
    print(json.dumps({"labels": labels, "best": result["best_metric"]}))


def cmd_train_cross_encoder(args):
    """Train a cross-encoder pair classifier (the reranker model;
    reference TransformerWrapper training, modeling.py:90-146)."""
    jax = _jax()
    import jax.numpy as jnp

    from ..data.datasets import load_paws, load_nli, load_sts
    from ..data.pairs import build_pair_batches, build_packed_pair_batches
    from ..train import (
        make_optimizer, make_classifier_train_step,
        make_packed_classifier_train_step, init_train_state,
    )
    from ..train.steps import init_classifier_head
    from ..train.trainer import Trainer
    from ..models.cross_encoder import CrossEncoder
    from ..core.precision import precision_for

    if args.format == "nli":
        rows = load_nli(args.data)
        num_classes = 3
    else:
        rows = load_paws(args.data)
        num_classes = 2
    texts = [a for a, _, _ in rows] + [b for _, b, _ in rows]
    enc = _encoder(args, texts=texts)
    if args.packed:
        if getattr(args, "pipe", 1) > 1:
            raise SystemExit("--packed and --pipe are mutually exclusive")
        batches = build_packed_pair_batches(
            enc.tokenizer, [(a, b) for a, b, _ in rows],
            [l for _, _, l in rows], rows_per_side=args.packed_rows,
            width=args.max_len, mode="cross", target_dtype=np.int32,
            seed=args.seed,
        )
    else:
        batches = build_pair_batches(
            enc.tokenizer, [(a, b) for a, b, _ in rows],
            [l for _, _, l in rows], batch_size=args.batch_size,
            max_len=args.max_len, mode="cross", target_dtype=np.int32,
            seed=args.seed,
        )
    cfg = _train_cfg(args)
    params = {
        "encoder": enc.params,
        "head": init_classifier_head(
            jax.random.PRNGKey(args.seed + 1), enc.arch.hidden_size,
            num_classes,
        ),
    }
    tx = make_optimizer(cfg, len(batches) * cfg.epochs, params_example=params)
    state = init_train_state(params, tx, seed=args.seed)
    if args.packed:
        step = make_packed_classifier_train_step(
            enc.arch, tx, precision=precision_for(cfg.bf16),
        )
    else:
        step = make_classifier_train_step(
            enc.arch, tx, pooling="cls", precision=precision_for(cfg.bf16),
            pp_mesh=_pp_mesh(args),
        )
    trainer = Trainer(step, state, save_path=args.save_path)
    result = trainer.execute(
        lambda e: (jax.tree.map(jnp.asarray, b) for b in batches),
        epochs=cfg.epochs,
    )
    ce = CrossEncoder(
        result["state"].params, enc.arch, tokenizer=enc.tokenizer,
        num_classes=num_classes, precision=precision_for(cfg.bf16),
    )
    ce.save(args.save_path)
    print(json.dumps({"num_classes": num_classes, "best": result["best_metric"]}))


def cmd_train_wic(args):
    jax = _jax()
    import jax.numpy as jnp

    from ..data.datasets import load_wic
    from ..data.pairs import build_word_batches
    from ..train import make_optimizer, init_train_state
    from ..train.steps import make_word_encoder_train_step
    from ..train.trainer import Trainer
    from ..models.word_encoder import WordEncoder
    from ..core.precision import precision_for

    rows = load_wic(args.data, args.gold)
    texts = [r["sent1"] for r in rows] + [r["sent2"] for r in rows]
    enc = _encoder(args, texts=texts)
    batches = build_word_batches(
        enc.tokenizer, rows, batch_size=args.batch_size,
        max_len=args.max_len, seed=args.seed,
    )
    cfg = _train_cfg(args)
    params = {"encoder": enc.params}
    tx = make_optimizer(cfg, len(batches) * cfg.epochs, params_example=params)
    state = init_train_state(params, tx, seed=args.seed)
    step = make_word_encoder_train_step(
        enc.arch, tx, precision=precision_for(cfg.bf16),
        pp_mesh=_pp_mesh(args),
    )
    trainer = Trainer(step, state, save_path=args.save_path)
    result = trainer.execute(
        lambda e: (jax.tree.map(jnp.asarray, b) for b in batches),
        epochs=cfg.epochs,
    )
    # best-threshold WiC accuracy with the trained encoder
    word_enc = WordEncoder(
        result["state"].params["encoder"], enc.arch,
        tokenizer=enc.tokenizer, precision=precision_for(cfg.bf16),
    )
    metrics = word_enc.evaluate_wic(batches)
    enc.params = result["state"].params["encoder"]
    enc.save(args.save_path)
    print(json.dumps({"wic": metrics, "best": result["best_metric"]}))


def cmd_train_ner(args):
    jax = _jax()
    import jax.numpy as jnp

    from ..data.datasets import load_conll_ner
    from ..train import make_optimizer, init_train_state
    from ..train.steps import (
        make_token_classifier_train_step, init_classifier_head,
    )
    from ..train.trainer import Trainer

    sents = load_conll_ner(args.data)
    tags = sorted({t for s in sents for t in s["tags"]})
    tag2id = {t: i for i, t in enumerate(tags)}
    enc = _encoder(args, texts=[" ".join(s["tokens"]) for s in sents])
    tok = enc.tokenizer

    # build token batches: first sub-token gets the tag, rest -100
    rows, tag_rows = [], []
    for s in sents:
        ids = [tok.cls_id]
        tg = [-100]
        for w, t in zip(s["tokens"], s["tags"]):
            pieces = tok._wordpiece(w.lower() if tok.lowercase else w)
            ids.extend(pieces[: args.max_len - 2 - len(ids)])
            tg.extend([tag2id[t]] + [-100] * (len(pieces) - 1))
            tg = tg[: len(ids)]
            if len(ids) >= args.max_len - 2:   # row full: stop tokenizing
                break
        ids.append(tok.sep_id)
        tg.append(-100)
        rows.append(ids)
        tag_rows.append(tg)

    from ..data.batching import BUCKETS
    from ..data.pairs import _cap_bucket

    batches = []
    bs = args.batch_size
    order = np.argsort([len(r) for r in rows])
    for st in range(0, len(order), bs):
        g = order[st : st + bs]
        L = _cap_bucket(
            max(len(rows[i]) for i in g), BUCKETS, args.max_len
        )
        ids = np.full((bs, L), tok.pad_id, np.int32)
        mask = np.zeros((bs, L), np.int32)
        tg = np.full((bs, L), -100, np.int32)
        for j, i in enumerate(g):
            ids[j, : len(rows[i])] = rows[i]
            mask[j, : len(rows[i])] = 1
            tg[j, : len(tag_rows[i])] = tag_rows[i]
        batches.append({"ids": ids, "mask": mask, "tags": tg})

    cfg = _train_cfg(args)
    params = {
        "encoder": enc.params,
        "head": init_classifier_head(
            jax.random.PRNGKey(1), enc.arch.hidden_size, len(tags)
        ),
    }
    tx = make_optimizer(cfg, len(batches) * cfg.epochs, params_example=params)
    state = init_train_state(params, tx)
    step = make_token_classifier_train_step(
        enc.arch, tx, pp_mesh=_pp_mesh(args),
    )
    trainer = Trainer(step, state, save_path=args.save_path)
    result = trainer.execute(
        lambda e: (jax.tree.map(jnp.asarray, b) for b in batches),
        epochs=cfg.epochs,
    )
    print(json.dumps({"tags": tags, "best": result["best_metric"]}))


def cmd_distill(args):
    from ..compress.distill import SentenceEncoderDistiller
    from ..data.datasets import load_sentence_pool, load_parallel
    from ..models.sentence_encoder import SentenceEncoder

    teacher = SentenceEncoder.load(args.model, bf16=not args.fp32)
    if args.parallel_data:
        pairs = load_parallel(args.parallel_data, max_pairs=args.max_sentences)
        sentences = [t for _, t in pairs]
        src = [s for s, _ in pairs]
    else:
        sentences = load_sentence_pool(args.data, max_sentences=args.max_sentences)
        src = None
    distiller = SentenceEncoderDistiller(
        teacher,
        num_student_layers=args.student_layers,
        # _train_cfg: the subcommand advertises --seed/--warmup-ratio/
        # --grad-accum/--max-len, so honor them (a hand-built TrainConfig
        # silently dropped all four)
        train_config=_train_cfg(args),
    )
    student = distiller.distill(
        sentences, src_sentences=src, max_len=args.max_len
    )
    student.save(args.save_path)
    print(json.dumps({
        "student_layers": student.arch.num_layers,
        "saved": args.save_path,
    }))


def cmd_eval_classification(args):
    """Evaluate a trained document classifier (reference
    src/evaluation/eval_document_classifier.py:18-107): accuracy +
    per-class report over a labeled document set."""
    jax = _jax()
    import jax.numpy as jnp

    from ..core.config import EncoderArch
    from ..core.precision import precision_for
    from ..core import checkpoint as ckpt
    from ..data.datasets import load_documents_json
    from ..data.tokenization import load_tokenizer
    from ..data.pairs import build_sequence_batches
    from ..train.steps import classifier_forward

    with open(os.path.join(args.model, "arch.json")) as f:
        arch = EncoderArch.from_json(f.read())
    with open(os.path.join(args.model, "labels.json")) as f:
        labels = json.load(f)
    lab2id = {l: i for i, l in enumerate(labels)}
    tok = load_tokenizer(args.model)
    params, _, _ = ckpt.restore_checkpoint_raw(
        ckpt.latest_checkpoint(args.model)
    )
    docs = load_documents_json(args.data)
    texts = [d["text"] for d in docs]
    y = np.asarray([lab2id.get(d["label"], -1) for d in docs])
    batches = build_sequence_batches(
        tok, texts, list(y), batch_size=args.batch_size,
        max_len=args.max_len, seed=0, shuffle=False,
    )
    precision = precision_for(not args.fp32)

    @jax.jit
    def fwd(p_, ids_, mask_):
        return classifier_forward(
            p_, ids_, mask_, None, arch=arch, precision=precision,
            pooling="cls",
        )

    preds, gold = [], []
    for b in batches:
        logits = fwd(params, jnp.asarray(b["ids"]), jnp.asarray(b["mask"]))
        p = np.asarray(jnp.argmax(logits, axis=-1))
        valid = np.asarray(b["valid"]).astype(bool)
        preds.extend(p[valid].tolist())
        gold.extend(np.asarray(b["labels"])[valid].tolist())
    preds, gold = np.asarray(preds), np.asarray(gold)
    acc = float((preds == gold).mean()) if len(gold) else 0.0
    per_class = {
        lab: float((preds[gold == i] == i).mean())
        for i, lab in enumerate(labels)
        if (gold == i).any()
    }
    print(json.dumps({"accuracy": acc, "per_class": per_class,
                      "n": int(len(gold))}))


def cmd_pretrain_long(args):
    """Long-model conversion + MLM re-pretraining: tile position embeddings
    to --target-len, switch to sliding-window attention, adapt with
    masked-LM steps (reference: src/scripts/make_long_transformer.py:34-110
    — position tiling :47-54, LongformerSelfAttention swap :56-68, MLM
    trainer loop :84-110)."""
    jax = _jax()
    import jax.numpy as jnp

    from ..data.datasets import load_sentence_pool
    from ..models.hf_convert import extend_positions
    from ..models.sentence_encoder import SentenceEncoder
    from ..train import make_optimizer
    from ..train.steps import make_mlm_train_step, init_train_state

    enc = _encoder(args, texts=None) if args.model else None
    if enc is None:
        texts_boot = load_sentence_pool(args.data, max_sentences=256)
        enc = _encoder(args, texts=texts_boot)
    params, arch = extend_positions(enc.params, enc.arch, args.target_len)
    arch = arch.replace(attention_window=args.window)

    texts = load_sentence_pool(args.data, max_sentences=args.max_sentences)
    ids, mask = enc.tokenizer.encode_batch(texts, max_len=args.target_len)
    cfg = _train_cfg(args)
    n = (len(texts) // cfg.batch_size) * cfg.batch_size
    batches = [
        {
            "ids": jnp.asarray(ids[i:i + cfg.batch_size]),
            "mask": jnp.asarray(mask[i:i + cfg.batch_size]),
        }
        for i in range(0, n, cfg.batch_size)
    ]
    if not batches:
        raise SystemExit("not enough documents for one batch")
    mlm_params = {
        "encoder": params,
        "mlm_bias": jnp.zeros((arch.vocab_size,), jnp.float32),
    }
    total = len(batches) * cfg.epochs
    tx = make_optimizer(cfg, total, params_example=mlm_params)
    state = init_train_state(mlm_params, tx, seed=args.seed)
    tok = enc.tokenizer
    specials = sorted({
        tok.pad_id, getattr(tok, "unk_id", tok.pad_id), tok.cls_id,
        tok.sep_id, tok.mask_id,
    })
    step = make_mlm_train_step(
        arch, tx, mask_token_id=tok.mask_id,
        mask_prob=args.mask_prob, special_ids=tuple(specials),
        pp_mesh=_pp_mesh(args),
    )
    first = last = None
    for epoch in range(cfg.epochs):
        pend = []
        for b in batches:
            state, m = step(state, b)
            pend.append(m["loss"])
        losses = [float(x) for x in jax.device_get(pend)]
        if first is None:
            first = losses[0]
        last = losses[-1]
    enc.params = state.params["encoder"]
    enc.arch = arch
    enc.save(args.save_path)
    print(json.dumps({
        "target_len": args.target_len,
        "window": args.window,
        "mlm_loss_first": first,
        "mlm_loss_last": last,
        "saved": args.save_path,
    }))


def cmd_theseus(args):
    """Theseus-compress a bi-encoder on a labeled pair dataset
    (reference distill_theseus / distill_paws flow)."""
    jax = _jax()
    import jax.numpy as jnp

    from ..compress.theseus import TheseusDistiller, ReplacementScheduler
    from ..data.datasets import load_paws, load_nli
    from ..data.pairs import build_pair_batches
    from ..models.sentence_encoder import SentenceEncoder
    from ..train import make_optimizer, init_train_state
    from ..train.steps import init_classifier_head

    teacher = SentenceEncoder.load(args.model, bf16=not args.fp32)
    rows = (
        load_nli(args.data) if args.format == "nli" else load_paws(args.data)
    )
    num_classes = 3 if args.format == "nli" else 2
    pairs = [(a, b) for a, b, _ in rows]
    labels = [l for _, _, l in rows]
    batches = build_pair_batches(
        teacher.tokenizer, pairs, labels, batch_size=args.batch_size,
        max_len=args.max_len, target_dtype=np.int32, seed=args.seed,
    )
    cfg = _train_cfg(args)
    distiller = TheseusDistiller(
        teacher.params, teacher.arch, num_slots=args.slots,
        scheduler=ReplacementScheduler(args.base_rate, args.rate_k),
        train_config=cfg,
    )
    params = {
        "succ": distiller.succ,
        "head": init_classifier_head(
            jax.random.PRNGKey(args.seed + 1),
            3 * teacher.arch.embedding_size, num_classes,
        ),
    }
    tx = make_optimizer(cfg, len(batches) * cfg.epochs, params_example=params)
    state = init_train_state(params, tx, seed=args.seed)
    step = distiller.make_train_step(tx, num_classes=num_classes)
    pred_layers = teacher.params["layers"]
    embeddings = teacher.params["embeddings"]
    step_no = 0
    for epoch in range(cfg.epochs):
        losses = []
        for b in batches:
            # local counter: state.step increments by exactly 1 per call,
            # and a device_get here would sync the ~30ms relay every batch
            rate = distiller.scheduler.rate(step_no)
            step_no += 1
            state, m = step(
                state, jax.tree.map(jnp.asarray, b), rate,
                pred_layers, embeddings,
            )
            losses.append(m["loss"])
        losses = [float(x) for x in jax.device_get(losses)]
        print(f"epoch {epoch}: loss {np.mean(losses):.4f}", file=sys.stderr)
    student = SentenceEncoder(
        distiller.compressed_params(state.params["succ"]),
        distiller.compressed_arch,
        tokenizer=teacher.tokenizer,
        pooling=teacher.pooling,
        precision=teacher.precision,
    )
    student.save(args.save_path)
    print(json.dumps({
        "layers": distiller.compressed_arch.num_layers,
        "saved": args.save_path,
    }))


def cmd_prune(args):
    """Head/FFN importance pruning of a classifier checkpoint produced by
    train-classification (reference prune_rewire flow)."""
    jax = _jax()
    from ..compress.prune import head_importance, ffn_importance, prune_rewire
    from ..core.config import EncoderArch
    from ..core import checkpoint as ckpt
    from ..data.datasets import load_documents_json
    from ..data.pairs import build_sequence_batches
    from ..data.tokenization import load_tokenizer

    with open(os.path.join(args.model, "arch.json")) as f:
        arch = EncoderArch.from_json(f.read())
    cdir = ckpt.latest_checkpoint(args.model)
    params, _, _ = ckpt.restore_checkpoint_raw(cdir)
    tok = load_tokenizer(args.model)

    docs = load_documents_json(args.data)
    labels = sorted({d["label"] for d in docs})
    lab2id = {l: i for i, l in enumerate(labels)}
    # shuffled: batches are length-sorted, so an unshuffled [:N] slice
    # would estimate importance only on the SHORTEST documents (pruning
    # away long-range heads that matter on normal inputs)
    batches = build_sequence_batches(
        tok, [d["text"] for d in docs], [lab2id[d["label"]] for d in docs],
        batch_size=args.batch_size, max_len=args.max_len, shuffle=True,
        seed=args.seed,
    )[: args.importance_batches]
    hi = head_importance(params, arch, batches)
    fi = ffn_importance(params, arch, batches)
    new_enc, new_arch = prune_rewire(
        params["encoder"], arch, hi, fi,
        target_heads=args.target_heads, target_ffn=args.target_ffn,
    )
    os.makedirs(args.save_path, exist_ok=True)
    ckpt.save_checkpoint(
        args.save_path, {"encoder": new_enc, "head": params["head"]},
        step=0, meta={"pruned": True},
    )
    with open(os.path.join(args.save_path, "arch.json"), "w") as f:
        f.write(new_arch.to_json())
    # keep the classifier evaluatable: eval-classification needs the
    # label list train-classification saved with the original model
    with open(os.path.join(args.save_path, "labels.json"), "w") as f:
        json.dump(labels, f)
    if hasattr(tok, "save_vocab"):
        tok.save_vocab(os.path.join(args.save_path, "vocab.txt"))
    print(json.dumps({
        "heads": new_arch.num_heads,
        "ffn": new_arch.intermediate_size,
        "saved": args.save_path,
    }))


def cmd_quantize(args):
    jax = _jax()
    from ..models.sentence_encoder import SentenceEncoder
    from ..compress.quantize import save_quantized

    enc = SentenceEncoder.load(args.model, bf16=not args.fp32)
    # pooling rides in meta — without it the reloaded int8 model would
    # silently default to mean pooling
    save_quantized(args.save_path, enc.params, meta={"pooling": enc.pooling})
    with open(os.path.join(args.save_path, "arch.json"), "w") as f:
        f.write(enc.arch.to_json())
    if enc.tokenizer is not None and hasattr(enc.tokenizer, "save_vocab"):
        enc.tokenizer.save_vocab(os.path.join(args.save_path, "vocab.txt"))
    print(json.dumps({"saved": args.save_path, "format": "int8"}))


def cmd_export(args):
    from ..models.sentence_encoder import SentenceEncoder
    from ..compress.export import export_encoder_stablehlo

    enc = SentenceEncoder.load(args.model, bf16=not args.fp32)
    manifest = export_encoder_stablehlo(
        enc, args.save_path,
        batch_sizes=tuple(args.batch_sizes), seq_lens=tuple(args.seq_lens),
    )
    print(json.dumps(manifest["functions"]))


def cmd_eval_sts(args):
    from ..data.datasets import load_sts
    from ..evaluation.evaluators import ParaphraseEvaluator
    from ..models.sentence_encoder import SentenceEncoder

    rows = load_sts(args.data)[: args.max_pairs]
    enc = SentenceEncoder.load(args.model, bf16=not args.fp32)
    ev = ParaphraseEvaluator(enc, mode="regression")
    out = ev.evaluate(
        [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows]
    )
    print(json.dumps(out, indent=2))


def cmd_eval_paws(args):
    from ..data.datasets import load_paws
    from ..evaluation.evaluators import ParaphraseEvaluator
    from ..models.sentence_encoder import SentenceEncoder

    rows = load_paws(args.data)[: args.max_pairs]
    enc = SentenceEncoder.load(args.model, bf16=not args.fp32)
    ev = ParaphraseEvaluator(enc, mode="binary")
    out = ev.evaluate(
        [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows]
    )
    print(json.dumps(out, indent=2))


def cmd_eval_tatoeba(args):
    from ..data.datasets import load_parallel
    from ..evaluation.evaluators import RetrievalEvaluator
    from ..models.sentence_encoder import SentenceEncoder

    pairs = load_parallel(args.data, max_pairs=args.max_pairs)
    enc = SentenceEncoder.load(args.model, bf16=not args.fp32)
    out = RetrievalEvaluator(enc).evaluate(
        [s for s, _ in pairs], [t for _, t in pairs]
    )
    print(json.dumps(out, indent=2))


def cmd_encode(args):
    """Embed a text file → (N, D) fp32 .npy (the reference's encode_text
    as a batch tool, sentence_encoder.py:133-173). ``--packed`` packs
    short sentences several-per-row behind a block-diagonal attention
    mask (data/packing.py) — the short-text throughput path."""
    import numpy as np

    from ..models.sentence_encoder import SentenceEncoder

    enc = SentenceEncoder.load(args.model, bf16=not args.fp32)
    with open(args.corpus, encoding="utf-8") as f:
        texts = [l.strip() for l in f if l.strip()]
    if args.packed:
        emb = enc.encode_packed(
            texts, width=args.width, max_len=args.width
        )
    else:
        emb = enc.encode(texts, max_len=args.width)
    np.save(args.out, np.asarray(emb))
    print(f"encoded {len(texts)} texts -> {args.out} {emb.shape}")


def cmd_search(args):
    from ..models.sentence_encoder import SentenceEncoder
    from ..pipelines import SemanticSearchPipeline
    from ..core.config import IndexConfig

    enc = SentenceEncoder.load(args.model, bf16=not args.fp32)
    with open(args.corpus, encoding="utf-8") as f:
        corpus = [l.strip() for l in f if l.strip()]
    pipe = SemanticSearchPipeline(
        enc, corpus=corpus,
        index_config=IndexConfig(
            num_clusters=args.clusters, num_probes=args.probes
        ),
    )
    if args.query:
        for row in pipe([args.query], args.top_k)[0]:
            print(f"{row[1]:.4f}\t{row[0]}")
        return
    print("interactive search — empty line to exit")
    while True:
        try:
            q = input("query> ").strip()
        except EOFError:   # Ctrl-D / exhausted piped stdin: clean exit
            break
        if not q:
            break
        for row in pipe([q], args.top_k)[0]:
            print(f"{row[1]:.4f}\t{row[0]}")


def cmd_serve(args):
    """Search serving daemon (the reference's APISearchPipeline intent,
    search_pipeline.py:178-226, as a JSON-over-HTTP service)."""
    from ..models.sentence_encoder import SentenceEncoder
    from ..pipelines import SemanticSearchPipeline
    from ..pipelines.serve import SearchServer

    if args.shards > 1:
        # corpus sharded over the mesh index axis: per-shard scan +
        # all-gather top-k merge (north-star config 5). Bulk encode runs
        # data-parallel over the SAME devices (a second mesh view).
        import jax

        from ..core.mesh import make_mesh
        from ..pipelines.search import ShardedSearchPipeline

        devs = jax.devices()[: args.shards]
        # DP encode needs the fixed 128-row encode batches to divide
        # evenly over the data axis; odd shard counts (3, 6, ...) fall
        # back to single-device encode rather than crash the first encode
        enc_mesh = (
            make_mesh(data=args.shards, devices=devs)
            if 128 % args.shards == 0 else None
        )
        enc = SentenceEncoder.load(
            args.model, mesh=enc_mesh, bf16=not args.fp32
        )
        if args.int8:
            enc.to_int8()
        mesh = make_mesh(data=1, index=args.shards, devices=devs)
        if args.load:
            pipe = ShardedSearchPipeline.load(args.load, enc, mesh)
        else:
            pipe = ShardedSearchPipeline(enc, mesh)
            if args.corpus:
                with open(args.corpus, encoding="utf-8") as f:
                    pipe.add_documents(
                        [l.strip() for l in f if l.strip()]
                    )
    else:
        enc = SentenceEncoder.load(args.model, bf16=not args.fp32)
        if args.int8:
            enc.to_int8()
        pipe = SemanticSearchPipeline(enc)
        if args.load:
            pipe.load_corpus(args.load)
        elif args.corpus:
            with open(args.corpus, encoding="utf-8") as f:
                pipe.add_documents([l.strip() for l in f if l.strip()])
    if args.warmup:
        n = pipe.warmup(max_queries=args.warmup)
        print(f"warmed {n} (bucket, k) serving shapes", flush=True)
    reranker = None
    if args.rerank_model:
        from ..models.cross_encoder import CrossEncoder
        from ..pipelines.rerank import RankingPipeline

        ce = CrossEncoder.load(args.rerank_model, bf16=not args.fp32)
        if args.int8:
            ce.to_int8()
        reranker = RankingPipeline(
            pipe, ce, retrieve_k=args.retrieve_k, batch_size=512
        )
        if args.warmup and len(pipe.corpus) > 0:
            # precompile the retrieve(k)+CE scoring shapes before traffic
            # (first /rerank otherwise pays them; drives/serve_load.py
            # measured multi-second compile stalls on a cold daemon)
            reranker([pipe.corpus[0]], top_k=min(10, args.retrieve_k))
            print("warmed rerank path", flush=True)
    server = SearchServer(
        pipe, host=args.host, port=args.port,
        batch_window=args.batch_window_ms / 1000.0,
        reranker=reranker,
    )
    print(f"serving on http://{args.host}:{server.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


def cmd_mine(args):
    from ..models.sentence_encoder import SentenceEncoder
    from ..pipelines import SentenceMiningPipeline

    enc = SentenceEncoder.load(args.model, bf16=not args.fp32)
    with open(args.corpus, encoding="utf-8") as f:
        corpus = [l.strip() for l in f if l.strip()]
    use_ivf = {"auto": None, "on": True, "off": False}[args.ivf]
    pairs = SentenceMiningPipeline(enc, use_ivf=use_ivf)(
        corpus, k=args.top_k, min_score=args.min_score
    )
    for i, j, s in pairs[: args.max_pairs]:
        print(f"{s:.4f}\t{corpus[i]}\t{corpus[j]}")


def cmd_compare_models(args):
    """Teacher vs compressed-student retrieval overlap (reference
    eval_sentence_mining.py compare_models)."""
    from ..models.sentence_encoder import SentenceEncoder
    from ..pipelines.search import compare_models

    teacher = SentenceEncoder.load(args.model, bf16=not args.fp32)
    student = SentenceEncoder.load(args.student, bf16=not args.fp32)
    if student.tokenizer is None:
        student.tokenizer = teacher.tokenizer
    with open(args.corpus, encoding="utf-8") as f:
        corpus = [l.strip() for l in f if l.strip()]
    queries = corpus[: args.num_queries]
    print(json.dumps(
        compare_models(teacher, student, corpus, queries, k=args.top_k)
    ))


def cmd_cluster(args):
    """K-means document clustering (reference src/pipeline/clustering.py:
    8-31): prints cluster id -> member documents as JSON lines."""
    from ..pipelines.clustering import ClusteringPipeline

    with open(args.corpus, encoding="utf-8") as f:
        corpus = [l.strip() for l in f if l.strip()]
    enc = _encoder(args, texts=corpus)
    pipe = ClusteringPipeline(enc, num_clusters=args.num_clusters)
    clusters = pipe(corpus)
    for cid in sorted(clusters):
        print(json.dumps({"cluster": cid, "size": len(clusters[cid]),
                          "examples": clusters[cid][:5]}))


def cmd_topics(args):
    from ..models.sentence_encoder import SentenceEncoder
    from ..pipelines import TopicModelingPipeline

    enc = SentenceEncoder.load(args.model, bf16=not args.fp32)
    with open(args.corpus, encoding="utf-8") as f:
        corpus = [l.strip() for l in f if l.strip()]
    lexicon = None
    if args.lexicon:
        from ..utils.lexicon import Lexicon

        if args.lexicon == "wordnet":
            lexicon = Lexicon.from_wordnet()  # needs nltk corpus data
        else:
            lexicon = Lexicon.from_json(args.lexicon)
    res = TopicModelingPipeline(
        enc, num_topics=args.num_topics, method=args.method,
        reduce=args.reduce, lexicon=lexicon,
    )(corpus)
    names = res.get("names", {})
    for t, words in sorted(res["topics"].items()):
        row = [t, res["sizes"].get(t, 0), [w for w, _ in words]]
        if lexicon is not None:
            row.append("/".join(names.get(t, [])))
        print(*row)


# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="text_similarity_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train-sts"); _train_common(p)
    p.add_argument("--data", required=True)
    p.add_argument("--eval-data")
    p.add_argument("--no-eval", action="store_true")
    p.set_defaults(fn=cmd_train_sts)

    p = sub.add_parser("train-nli"); _train_common(p)
    p.add_argument("--data", required=True)
    p.set_defaults(fn=cmd_train_nli)

    p = sub.add_parser("train-paws"); _train_common(p)
    p.add_argument("--data", required=True)
    p.add_argument("--format", default="paws", choices=["paws", "quora"])
    p.add_argument(
        "--loss", default="online_contrastive",
        choices=["contrastive", "online_contrastive", "mnrl", "cosine_mse"],
    )
    p.set_defaults(fn=cmd_train_paws)

    p = sub.add_parser("train-classification"); _train_common(p)
    p.add_argument("--data", required=True)
    p.add_argument("--paragraph-words", type=int, default=0)
    p.set_defaults(fn=cmd_train_classification)

    p = sub.add_parser("train-cross-encoder"); _train_common(p)
    p.add_argument("--data", required=True)
    p.add_argument("--format", default="paws", choices=["paws", "nli"])
    p.set_defaults(fn=cmd_train_cross_encoder)

    p = sub.add_parser("train-wic"); _train_common(p)
    p.add_argument("--data", required=True)
    p.add_argument("--gold")
    p.set_defaults(fn=cmd_train_wic)

    p = sub.add_parser("train-ner"); _train_common(p)
    p.add_argument("--data", required=True)
    p.set_defaults(fn=cmd_train_ner)

    p = sub.add_parser("distill"); _train_common(p)
    p.add_argument("--data")
    p.add_argument("--parallel-data")
    p.add_argument("--student-layers", type=int, default=4)
    p.add_argument("--max-sentences", type=int, default=100000)
    p.set_defaults(fn=cmd_distill)

    p = sub.add_parser("eval-classification"); _train_common(p)
    p.add_argument("--data", required=True)
    p.set_defaults(fn=cmd_eval_classification)

    p = sub.add_parser("pretrain-long"); _train_common(p)
    p.add_argument("--data", required=True,
                   help="text file, one document per line")
    p.add_argument("--target-len", type=int, default=1024)
    p.add_argument("--window", type=int, default=128,
                   help="sliding attention window for the long model")
    p.add_argument("--mask-prob", type=float, default=0.15)
    p.add_argument("--max-sentences", type=int, default=100000)
    p.set_defaults(fn=cmd_pretrain_long)

    p = sub.add_parser("theseus"); _train_common(p)
    p.add_argument("--data", required=True)
    p.add_argument("--format", default="paws", choices=["paws", "nli"])
    p.add_argument("--slots", type=int, default=2)
    p.add_argument("--base-rate", type=float, default=0.3)
    p.add_argument("--rate-k", type=float, default=1e-3)
    p.set_defaults(fn=cmd_theseus)

    p = sub.add_parser("prune"); _train_common(p)
    p.add_argument("--data", required=True)
    p.add_argument("--target-heads", type=int, required=True)
    p.add_argument("--target-ffn", type=int, required=True)
    p.add_argument("--importance-batches", type=int, default=8)
    p.set_defaults(fn=cmd_prune)

    p = sub.add_parser("quantize"); _common(p)
    p.set_defaults(fn=cmd_quantize)

    p = sub.add_parser("export"); _common(p)
    p.add_argument("--batch-sizes", type=int, nargs="+", default=[32])
    p.add_argument("--seq-lens", type=int, nargs="+", default=[128])
    p.set_defaults(fn=cmd_export)

    for name, fn in [
        ("eval-sts", cmd_eval_sts),
        ("eval-paws", cmd_eval_paws),
        ("eval-tatoeba", cmd_eval_tatoeba),
    ]:
        p = sub.add_parser(name); _common(p)
        p.add_argument("--data", required=True)
        p.add_argument("--max-pairs", type=int, default=5000)
        p.set_defaults(fn=fn)

    p = sub.add_parser("encode"); _common(p)
    p.add_argument("--corpus", required=True,
                   help="text file, one sentence per line")
    p.add_argument("--out", required=True, help="output .npy path")
    p.add_argument("--packed", action="store_true",
                   help="greedy sequence packing: several short "
                        "sentences per row behind a block-diagonal "
                        "attention mask (short-text throughput)")
    p.add_argument("--width", type=int, default=128,
                   help="row width / max tokens per sentence")
    p.set_defaults(fn=cmd_encode)

    p = sub.add_parser("search"); _common(p)
    p.add_argument("--corpus", required=True)
    p.add_argument("--query")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--clusters", type=int, default=1024)
    p.add_argument("--probes", type=int, default=16)
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("serve"); _common(p)
    p.add_argument("--corpus", help="text file, one document per line")
    p.add_argument("--load", help="saved pipeline dir (from /save or save())")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch-window-ms", type=float, default=2.0,
                   help="micro-batch window for concurrent /search "
                        "requests (0 disables)")
    p.add_argument("--shards", type=int, default=1,
                   help=">1: shard the corpus over this many devices "
                        "(per-shard scan + all-gather top-k merge)")
    p.add_argument("--warmup", type=int, default=0,
                   help="precompile query buckets up to this many "
                        "queries before accepting requests (first "
                        "compiles are slow; pay them at startup)")
    p.add_argument("--int8", action="store_true",
                   help="serve with a true-int8 encoder (dynamic "
                        "activation quant + int8 MXU dots — the "
                        "reference's onnxruntime-int8 serving shape)")
    p.add_argument("--rerank-model",
                   help="cross-encoder dir: enables POST /rerank "
                        "(retrieve top --retrieve-k, re-score, return "
                        "top k — the reference ranking_pipeline served)")
    p.add_argument("--retrieve-k", type=int, default=100,
                   help="candidates retrieved per query before reranking")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("mine"); _common(p)
    p.add_argument("--corpus", required=True)
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--min-score", type=float, default=0.8)
    p.add_argument("--max-pairs", type=int, default=100)
    p.add_argument("--ivf", choices=("auto", "on", "off"), default="auto",
                   help="IVF-accelerated approximate mining (auto: on "
                        "at >=100k docs — exact mining is O(N^2))")
    p.set_defaults(fn=cmd_mine)

    p = sub.add_parser("compare-models"); _common(p)
    p.add_argument("--student", required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--num-queries", type=int, default=100)
    p.set_defaults(fn=cmd_compare_models)

    p = sub.add_parser("cluster"); _common(p)
    p.add_argument("--corpus", required=True)
    p.add_argument("--num-clusters", type=int, default=10)
    p.set_defaults(fn=cmd_cluster)

    p = sub.add_parser("topics"); _common(p)
    p.add_argument("--corpus", required=True)
    p.add_argument("--num-topics", type=int, default=10)
    p.add_argument("--method", default="kmeans",
                   choices=["kmeans", "density", "hdbscan"])
    p.add_argument("--reduce", default="pca", choices=["pca", "spectral"])
    p.add_argument("--lexicon", default=None,
                   help="taxonomy JSON for hypernym topic names "
                        "(or 'wordnet' to use the nltk corpus if installed)")
    p.set_defaults(fn=cmd_topics)

    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    _jax()   # persistent compile cache for every subcommand (CLAUDE.md 3)
    args.fn(args)


if __name__ == "__main__":
    main()
