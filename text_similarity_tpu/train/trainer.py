"""Trainer: epoch loop with eval-in-train and best-metric checkpointing.

Parity with reference ``Trainer``/``Learner`` (src/training/train.py:21-120,
learner.py:188-336) with the TPU-native differences:

- the inner loop is a single jitted step (train.steps) — no per-step host
  syncs; step metrics are device scalars fetched lazily at log boundaries
  (the reference calls .item()/.cpu() every step, learner.py:225-232);
- checkpoints are step-stamped and resumable (params+opt_state+step), the
  best-metric snapshot is additionally tagged (the reference only saves
  model weights on best metric, train.py:94-109);
- run history is a JSONL results file (the reference writes plain-text
  results files, train.py:113-117).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..core import checkpoint as ckpt
from ..utils.logging import get_logger

logger = get_logger("trainer")

# On-device pytree copy for async checkpoints: one jit, trace-cached per
# pytree structure (a per-save jit(lambda) would recompile every call).
_device_copy = jax.jit(lambda t: jax.tree.map(lambda x: x + 0, t))


class Trainer:
    def __init__(
        self,
        step_fn: Callable,                 # (state, batch) -> (state, metrics)
        state,                             # TrainState
        save_path: Optional[str] = None,
        eval_fn: Optional[Callable] = None,  # (state) -> Dict[str, float]
        tracked_metric: str = "loss",
        direction: str = "min",
        log_every: int = 50,
        checkpoint_every: int = 0,         # steps; 0 = only best/final
        save_optimizer: bool = True,
        prefetch: int = 2,                 # device-prefetch depth; 0 = off
        mesh=None,                         # shard prefetched batches here
        async_checkpoint: bool = True,     # overlap checkpoint IO with
                                           # training (device copy now,
                                           # host transfer + disk write in
                                           # a background thread)
    ):
        self.step_fn = step_fn
        self.state = state
        self.save_path = save_path
        self.eval_fn = eval_fn
        self.tracked_metric = tracked_metric
        self.direction = direction
        self.log_every = log_every
        self.checkpoint_every = checkpoint_every
        self.save_optimizer = save_optimizer
        self.prefetch = prefetch
        self.mesh = mesh
        self.async_checkpoint = async_checkpoint
        self.best_metric = -np.inf if direction == "max" else np.inf
        self.history = []
        self._save_thread = None
        self._save_error = None

    def _is_better(self, value: float) -> bool:
        if self.direction == "max":
            return value > self.best_metric
        return value < self.best_metric

    def execute(
        self,
        batches_per_epoch: Callable[[int], Iterable[dict]],
        epochs: int = 1,
        write_results: bool = True,
    ) -> Dict:
        """Run training. ``batches_per_epoch(epoch)`` yields host or device
        batch dicts (fixed shapes); with ``prefetch > 0`` (the default) a
        background thread device_puts (and mesh-shards, when ``mesh`` is
        set) the next batches while the current step runs, so the step
        always dequeues device-resident data — unlike the reference's
        inline per-step transfer (learner.py:202-206)."""
        global_step = int(jax.device_get(self.state.step))
        for epoch in range(epochs):
            t0 = time.time()
            pending = []  # device metric pytrees, fetched at log boundaries
            n_steps = 0
            epoch_metrics: Dict[str, float] = {}
            epoch_batches = batches_per_epoch(epoch)
            prefetcher = None
            if self.prefetch > 0:
                from .prefetch import DevicePrefetcher

                epoch_batches = prefetcher = DevicePrefetcher(
                    epoch_batches, depth=self.prefetch, mesh=self.mesh
                )
            try:
                for batch in epoch_batches:
                    self.state, metrics = self.step_fn(self.state, batch)
                    pending.append(metrics)
                    n_steps += 1
                    global_step += 1
                    if len(pending) >= self.log_every:
                        epoch_metrics = self._drain(pending, epoch_metrics)
                        pending = []
                    if (
                        self.checkpoint_every
                        and self.save_path
                        and global_step % self.checkpoint_every == 0
                    ):
                        self._save(global_step, tag=None)
            finally:
                # a step_fn exception must not abandon the producer
                # thread blocked on a full queue (it would pin depth+1
                # device-resident batches for the process lifetime)
                if prefetcher is not None:
                    prefetcher.close()
                # ...nor an in-flight async checkpoint: wait for it so a
                # propagating exception can't kill the process mid-write
                # (join only; the step error must not be masked by a
                # save error, which re-raises on the next save/join)
                if self._save_thread is not None:
                    self._save_thread.join()
            epoch_metrics = self._drain(pending, epoch_metrics)
            dt = time.time() - t0
            avg = {
                k: v / max(n_steps, 1) for k, v in epoch_metrics.items()
            }
            record = {
                "epoch": epoch,
                "steps": n_steps,
                "seconds": round(dt, 2),
                "train": {k: round(v, 6) for k, v in avg.items()},
            }

            if self.eval_fn is not None:
                eval_metrics = self.eval_fn(self.state)
                record["eval"] = {
                    k: round(float(v), 6) for k, v in eval_metrics.items()
                }
                tracked = float(eval_metrics[self.tracked_metric])
                if self._is_better(tracked):
                    self.best_metric = tracked
                    if self.save_path:
                        self._save(global_step, tag="best")
            elif self.save_path:
                # track train loss when no eval is configured
                tracked = avg.get("loss", 0.0)
                if self.direction == "min" and self._is_better(tracked):
                    self.best_metric = tracked
                    self._save(global_step, tag="best")

            self.history.append(record)
            logger.info("epoch %d: %s", epoch, json.dumps(record))

        if self.save_path:
            self._save(global_step, tag="final")
            self.join_pending_save()   # execute() returning ⇒ durable
            if write_results:
                with open(os.path.join(self.save_path, "results.jsonl"), "w") as f:
                    for r in self.history:
                        f.write(json.dumps(r) + "\n")
        return {
            "best_metric": self.best_metric,
            "history": self.history,
            "state": self.state,
        }

    def _drain(self, pending, acc: Dict[str, float]) -> Dict[str, float]:
        if not pending:
            return acc
        fetched = jax.device_get(pending)
        for m in fetched:
            for k, v in m.items():
                v = float(v)
                if k == "loss" and not np.isfinite(v):
                    # NaN guard (the framework's failure-detection hook,
                    # SURVEY.md §5.2-5.3): fail loudly with context instead
                    # of silently training on garbage.
                    raise FloatingPointError(
                        f"non-finite loss at step "
                        f"{int(jax.device_get(self.state.step))}; enable "
                        f"jax.config.debug_nans to localize"
                    )
                acc[k] = acc.get(k, 0.0) + v
        return acc

    def _save(self, step: int, tag: Optional[str]):
        os.makedirs(self.save_path, exist_ok=True)
        params = self.state.params
        opt_state = self.state.opt_state if self.save_optimizer else None
        if self.async_checkpoint:
            # the train step donates its state buffers, so the live
            # params may be invalidated the moment the next step runs —
            # snapshot with an on-device copy (cheap, one fused op) and
            # push the expensive part (device→host transfer + np.savez)
            # off the training thread
            self.join_pending_save()   # one writer at a time, in order
            params = _device_copy(params)
            opt_state = (
                _device_copy(opt_state) if opt_state is not None else None
            )

            def write():
                try:
                    self._write_checkpoint(params, opt_state, step, tag)
                except Exception as e:   # surfaced on the next save/join
                    self._save_error = e

            import threading

            self._save_thread = threading.Thread(target=write, daemon=True)
            self._save_thread.start()
        else:
            self._write_checkpoint(params, opt_state, step, tag)

    def _write_checkpoint(self, params, opt_state, step, tag):
        d = ckpt.save_checkpoint(
            self.save_path,
            params,
            opt_state=opt_state,
            step=step,
            meta={"tag": tag or "periodic", "best_metric": float(self.best_metric)},
        )
        if tag:
            with open(os.path.join(self.save_path, f"{tag.upper()}"), "w") as f:
                f.write(os.path.basename(d))

    def join_pending_save(self):
        """Block until the in-flight async checkpoint (if any) is on disk;
        re-raise its error if it failed."""
        if self._save_thread is not None:
            self._save_thread.join()
            self._save_thread = None
        if self._save_error is not None:
            e, self._save_error = self._save_error, None
            raise e

    def resume(self, params_template, opt_template=None) -> bool:
        """Resume from the latest checkpoint under save_path (a capability
        the reference lacks entirely — SURVEY.md §5.4)."""
        if not self.save_path:
            return False
        d = ckpt.latest_checkpoint(self.save_path)
        if d is None:
            return False
        params, opt_state, step, meta = ckpt.restore_checkpoint(
            d, params_template, opt_template
        )
        import jax.numpy as jnp

        self.state = self.state._replace(
            params=params,
            opt_state=opt_state if opt_state is not None else self.state.opt_state,
            step=jnp.asarray(step, jnp.int32),
        )
        self.best_metric = meta.get("best_metric", self.best_metric)
        logger.info("resumed from %s (step %d)", d, step)
        return True
