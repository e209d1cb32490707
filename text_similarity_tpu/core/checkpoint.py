"""Checkpoint save/restore.

The reference persists HF weights + tokenizer + a *pickled* Configuration
(`model_config.bin`) and never persists optimizer state — there is no resume
path (reference: src/models/modeling.py:52-59, src/training/learner.py:80-98;
SURVEY.md §5.4). Here checkpoints are:

- step-stamped and resumable: params + opt_state + step in one snapshot,
- JSON metadata (no pickle),
- stored as a flat npz keyed by pytree paths, so they are readable from
  plain numpy and independent of jax versions.

Arrays are gathered to host on save; on restore, the caller re-shards by
device_put-ing with the desired sharding (models at this scale fit easily).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "/"


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(jax.device_get(leaf))
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return f"#{p.idx}"
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def _unflatten_into(template, flat: Dict[str, np.ndarray]):
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves:
        key = _SEP.join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing key {key!r}")
        arr = flat[key]
        if hasattr(leaf, "dtype"):
            arr = arr.astype(leaf.dtype)
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _spec_to_json(spec) -> list:
    out = []
    for e in tuple(spec):
        if e is None:
            out.append(None)
        elif isinstance(e, (tuple, list)):
            out.append(list(e))
        else:
            out.append(str(e))
    return out


def _spec_from_json(entry):
    from jax.sharding import PartitionSpec as P

    dims = [
        tuple(e) if isinstance(e, list) else e for e in entry
    ]
    return P(*dims)


def _collect_shardings(tree) -> Dict[str, list]:
    """Per-leaf PartitionSpec (as JSON-able lists) for leaves that carry a
    NamedSharding — persists the mesh layout with the checkpoint so a
    restore can re-place arrays without re-deriving specs (SURVEY §5.4)."""
    from jax.sharding import NamedSharding

    specs = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        sh = getattr(leaf, "sharding", None)
        if isinstance(sh, NamedSharding):
            key = _SEP.join(_path_str(p) for p in path)
            specs[key] = _spec_to_json(sh.spec)
    return specs


def save_checkpoint(
    path: str,
    params,
    opt_state=None,
    step: int = 0,
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Write a step-stamped checkpoint directory under ``path``. Sharding
    metadata (per-leaf PartitionSpecs) rides along in meta.json whenever
    the params are mesh-placed."""
    ckpt_dir = os.path.join(path, f"step_{step:08d}")
    # write into a .tmp dir and rename at the end: a crash mid-write (or a
    # dying async-checkpoint thread) must never leave a half-written
    # step_* dir that latest_checkpoint's fallback would pick up
    tmp_dir = ckpt_dir + ".tmp"
    if os.path.isdir(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir, exist_ok=True)
    shardings = _collect_shardings(params)
    np.savez(os.path.join(tmp_dir, "params.npz"), **_flatten(params))
    opt_shardings = {}
    if opt_state is not None:
        np.savez(os.path.join(tmp_dir, "opt_state.npz"), **_flatten(opt_state))
        # Adam moments inherit the param layouts (2× the param bytes) —
        # restoring them unplaced would silently replicate them
        opt_shardings = _collect_shardings(opt_state)
    info = {"step": step, "meta": meta or {}}
    if shardings:
        info["shardings"] = shardings
    if opt_shardings:
        info["opt_shardings"] = opt_shardings
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump(info, f, indent=2)
    if os.path.isdir(ckpt_dir):   # re-saving the same step: replace
        import shutil

        shutil.rmtree(ckpt_dir)
    os.rename(tmp_dir, ckpt_dir)
    # atomic-ish "latest" pointer
    with open(os.path.join(path, "LATEST"), "w") as f:
        f.write(os.path.basename(ckpt_dir))
    return ckpt_dir


def latest_checkpoint(path: str) -> Optional[str]:
    latest = os.path.join(path, "LATEST")
    if os.path.exists(latest):
        with open(latest) as f:
            name = f.read().strip()
        d = os.path.join(path, name)
        if os.path.isdir(d):
            return d
    cands = sorted(
        d for d in (os.listdir(path) if os.path.isdir(path) else [])
        if re.match(r"step_\d+$", d)
    )
    return os.path.join(path, cands[-1]) if cands else None


def restore_checkpoint(
    ckpt_dir: str,
    params_template,
    opt_state_template=None,
    mesh=None,
) -> Tuple[Any, Any, int, Dict[str, Any]]:
    """Restore (params, opt_state, step, meta) from a checkpoint dir.

    Templates provide pytree structure + dtypes (e.g. from init fns).
    With ``mesh``, leaves whose PartitionSpec was recorded at save time
    are device_put back onto the mesh with the same layout."""
    with np.load(os.path.join(ckpt_dir, "params.npz")) as z:
        params = _unflatten_into(params_template, dict(z))
    opt_state = None
    opt_path = os.path.join(ckpt_dir, "opt_state.npz")
    if opt_state_template is not None and os.path.exists(opt_path):
        with np.load(opt_path) as z:
            opt_state = _unflatten_into(opt_state_template, dict(z))
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        info = json.load(f)
    if mesh is not None:
        from jax.sharding import NamedSharding

        def place(tree, specs):
            paths_and_leaves, treedef = (
                jax.tree_util.tree_flatten_with_path(tree)
            )
            leaves = []
            for path, leaf in paths_and_leaves:
                key = _SEP.join(_path_str(p) for p in path)
                if key in specs:
                    leaf = jax.device_put(
                        leaf,
                        NamedSharding(mesh, _spec_from_json(specs[key])),
                    )
                leaves.append(leaf)
            return jax.tree_util.tree_unflatten(treedef, leaves)

        if info.get("shardings"):
            params = place(params, info["shardings"])
        if opt_state is not None and info.get("opt_shardings"):
            opt_state = place(opt_state, info["opt_shardings"])
    return params, opt_state, info["step"], info.get("meta", {})


def restore_checkpoint_raw(ckpt_dir: str) -> Tuple[dict, int, Dict[str, Any]]:
    """Template-free restore: rebuild the nested pytree from the flat key
    paths alone (used for artifacts whose structure the caller doesn't know
    statically, e.g. int8-quantized params with {q, s} leaf dicts)."""
    with np.load(os.path.join(ckpt_dir, "params.npz")) as z:
        flat = {k: z[k] for k in z.files}
    tree: dict = {}
    for key, arr in flat.items():
        parts = key.split(_SEP)
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(arr)
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        info = json.load(f)
    return tree, info["step"], info.get("meta", {})
