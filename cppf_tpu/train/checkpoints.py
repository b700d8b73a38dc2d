"""Checkpointing (orbax) + reference-format interop.

The reference saves bare ``state_dict`` .pth files every 20 epochs plus a
best-loss copy, with no optimizer state and no resume (reference
train.py:113-120).  We keep that cadence but save full train state
(params + optimizer + step) so training is resumable, and provide
``.pth`` import/export for parity with reference checkpoints.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(d: str) -> str:
    return os.path.abspath(d)


def _restore_numpy(path: str):
    """Restore a checkpoint as host numpy arrays regardless of the platform
    it was saved on (a TPU-saved checkpoint must be loadable in CPU-only
    processes: tests, eval drivers, warm starts)."""
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(path).item_metadata.tree
    return ckptr.restore(
        path,
        restore_args=jax.tree.map(lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree),
    )


def save_train_state(ckpt_dir: str, state, name: str = "best") -> None:
    path = os.path.join(_path(ckpt_dir), name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "opt_state": state.opt_state,
                      "step": state.step}, force=True)
    ckptr.wait_until_finished()


def load_train_state(ckpt_dir: str, abstract_state, name: str = "best"):
    """Restore a full train state.

    Restores to host numpy first (restoring straight onto a remote TPU
    device can wedge), then rebuilds the typed pytree (NamedTuples /
    optax states) from the template's structure.
    """
    path = os.path.join(_path(ckpt_dir), name)
    raw = _restore_numpy(path)  # nested dicts/lists of numpy arrays
    template = {
        "params": abstract_state.params,
        "opt_state": abstract_state.opt_state,
        "step": abstract_state.step,
    }
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    r_leaves = jax.tree_util.tree_leaves(raw)
    assert len(t_leaves) == len(r_leaves), (
        f"checkpoint structure mismatch: {len(r_leaves)} leaves vs template {len(t_leaves)}"
    )
    for a, b in zip(t_leaves, r_leaves):
        assert tuple(a.shape) == tuple(np.shape(b)), (a.shape, np.shape(b))
    restored = jax.tree_util.tree_unflatten(treedef, r_leaves)
    return type(abstract_state)(restored["params"], restored["opt_state"], restored["step"])


def save_params(ckpt_dir: str, params: Any, name: str = "best") -> None:
    path = os.path.join(_path(ckpt_dir), name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params}, force=True)
    ckptr.wait_until_finished()


def load_params(ckpt_dir: str, name: str = "best") -> Any:
    path = os.path.join(_path(ckpt_dir), name)
    restored = _restore_numpy(path)
    return jax.tree.map(np.asarray, restored["params"])


def load_reference_pth(point_pth: str, ppf_pth: str) -> dict:
    """Load a reference checkpoint pair into our params tree
    (reference nocs/inference.py:87-88 loads these files)."""
    from cppf_tpu.models.convert import (
        load_torch_state_dict,
        point_encoder_from_torch,
        ppf_encoder_from_torch,
    )

    return {
        "point": point_encoder_from_torch(load_torch_state_dict(point_pth)),
        "ppf": ppf_encoder_from_torch(load_torch_state_dict(ppf_pth)),
    }


def maybe_load_any(ckpt_dir: str, name: str = "best") -> Optional[dict]:
    """Load our orbax params if present, else a reference .pth pair, else None."""
    orbax_path = os.path.join(_path(ckpt_dir), name)
    if os.path.isdir(orbax_path):
        try:
            return load_params(ckpt_dir, name)
        except Exception as e:  # corrupt/partial save (e.g. a dir whose
            # array payload never landed — round-3 bookshelf outage): treat
            # as absent so multi-category drivers skip instead of dying
            logging.getLogger("cppf_tpu.checkpoints").warning(
                "unreadable checkpoint %s (%s: %s) — treating as missing",
                orbax_path, type(e).__name__, e)
    pt = os.path.join(ckpt_dir, f"point_encoder_epoch{name}.pth")
    pf = os.path.join(ckpt_dir, f"ppf_encoder_epoch{name}.pth")
    if os.path.exists(pt) and os.path.exists(pf):
        return load_reference_pth(pt, pf)
    return None
