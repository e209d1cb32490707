"""Hyper-parameter optimization.

Parity with the reference's Optuna ``ParamOptimizer``
(src/training/test.py:11-82: search over lr / num-layers / categoricals,
maximize an eval metric). Optuna is not a baked-in dependency here, so the
search core is self-contained: random search over a declarative space with
best-trial tracking (plus exhaustive grid for small spaces)."""

from __future__ import annotations

import itertools
import random
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

from ..utils.logging import get_logger

logger = get_logger("hpo")


class SearchSpace:
    """space = {"lr": ("loguniform", 1e-5, 1e-3), "layers": ("choice", [2,4]),
    "warmup": ("uniform", 0.0, 0.2), "bs": ("choice", [16, 32])}"""

    def __init__(self, space: Dict[str, Tuple]):
        self.space = space

    def sample(self, rng: random.Random) -> Dict[str, Any]:
        out = {}
        for name, spec in self.space.items():
            kind = spec[0]
            if kind == "choice":
                out[name] = rng.choice(list(spec[1]))
            elif kind == "uniform":
                out[name] = rng.uniform(spec[1], spec[2])
            elif kind == "loguniform":
                import math

                out[name] = math.exp(
                    rng.uniform(math.log(spec[1]), math.log(spec[2]))
                )
            elif kind == "int":
                out[name] = rng.randint(spec[1], spec[2])
            else:
                raise ValueError(f"unknown spec {kind}")
        return out

    def grid(self) -> List[Dict[str, Any]]:
        keys, vals = [], []
        for name, spec in self.space.items():
            if spec[0] != "choice":
                raise ValueError("grid search needs all-'choice' space")
            keys.append(name)
            vals.append(list(spec[1]))
        return [dict(zip(keys, combo)) for combo in itertools.product(*vals)]


class ParamOptimizer:
    """objective(trial_params) → float metric; direction max|min."""

    def __init__(
        self,
        objective: Callable[[Dict[str, Any]], float],
        space: SearchSpace,
        direction: str = "max",
        seed: int = 0,
    ):
        self.objective = objective
        self.space = space
        self.direction = direction
        self.rng = random.Random(seed)
        self.trials: List[Dict] = []

    def _better(self, a: float, b: float) -> bool:
        return a > b if self.direction == "max" else a < b

    def optimize(
        self, n_trials: int = 10, method: str = "random"
    ) -> Dict[str, Any]:
        candidates = (
            self.space.grid()[:n_trials]
            if method == "grid"
            else [self.space.sample(self.rng) for _ in range(n_trials)]
        )
        best_value, best_params = None, None
        for i, params in enumerate(candidates):
            value = float(self.objective(params))
            self.trials.append({"params": params, "value": value})
            if best_value is None or self._better(value, best_value):
                best_value, best_params = value, params
            logger.info(
                "trial %d/%d: %s -> %.5f (best %.5f)",
                i + 1, len(candidates), params, value, best_value,
            )
        return {"best_value": best_value, "best_params": best_params,
                "trials": self.trials}
