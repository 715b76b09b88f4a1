"""Full training-state checkpointing (params + optimizer state + epoch).

The reference has no optimizer-state or epoch resume — its "resume" is
re-reading feature caches (SURVEY.md §5).  Production training needs real
preemption recovery, so trainers can snapshot their complete state and resume
bit-exactly: the episodic trainer derives its episode RNG from
``(seed, epoch index)`` inside ``run_epoch``, so a resumed run samples the
exact same episodes as an uninterrupted one.

Snapshot format: a plain-pickled dict of primitive containers and numpy
arrays ONLY — the optimizer state is stored as its flattened leaves plus a
treedef fingerprint, never as optax's namedtuple classes.  That keeps the
file loadable through the same restricted unpickler as every other pickle
input this package reads (``io/torch_pt.py``), so a tampered snapshot
cannot execute code at load time.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np

from protoclip_tpu.io.torch_pt import load_pkl


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_train_state(path: str, trainer, extra: Dict[str, Any] | None = None) -> None:
    """Snapshot a trainer (EpisodicTrainer or QTTrainer) to ``path``.

    ``extra``: small plain-container payload the runner wants back on
    resume (e.g. best-val bookkeeping so a resumed run never overwrites a
    better checkpoint with a worse post-resume epoch).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    opt_leaves, opt_treedef = jax.tree_util.tree_flatten(trainer.opt_state)
    state: Dict[str, Any] = {
        "params": _to_host(trainer.params),
        "opt_leaves": [np.asarray(x) for x in opt_leaves],
        "opt_treedef": str(opt_treedef),
        "epoch": trainer.epoch,
        "kind": type(trainer).__name__,
        "extra": dict(extra or {}),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(state, fh, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_train_state(path: str, trainer) -> tuple[int, Dict[str, Any]]:
    """Restore a snapshot into a trainer; returns ``(resume_epoch, extra)``.

    The parameter/optimizer pytrees must match the trainer's in structure
    AND leaf shape/dtype (same config); params are transferred to device
    lazily on the next step.
    """
    state = load_pkl(path)  # restricted unpickler: no code execution
    if state["kind"] != type(trainer).__name__:
        raise ValueError(
            f"checkpoint is for {state['kind']}, trainer is {type(trainer).__name__}"
        )
    flat_saved, treedef_saved = jax.tree_util.tree_flatten(state["params"])
    flat_cur, treedef_cur = jax.tree_util.tree_flatten(trainer.params)
    if treedef_saved != treedef_cur:
        raise ValueError("parameter tree structure mismatch (different config?)")
    # structure alone is not enough: a snapshot from a different (N, K)
    # split with the same N*K and d has identical treedefs but reshapes
    # into wrong class groupings — compare every leaf's geometry too
    for saved, cur in zip(flat_saved, flat_cur):
        saved = np.asarray(saved)
        cur_shape = tuple(np.shape(cur))
        if tuple(saved.shape) != cur_shape:
            raise ValueError(
                f"parameter shape mismatch: checkpoint {tuple(saved.shape)} vs "
                f"trainer {cur_shape} (different config?)"
            )
        cur_dtype = np.dtype(getattr(cur, "dtype", np.asarray(cur).dtype))
        if saved.dtype != cur_dtype:
            raise ValueError(
                f"parameter dtype mismatch: checkpoint {saved.dtype} vs "
                f"trainer {cur_dtype} (different compute_dtype?)"
            )
    trainer.params = jax.tree_util.tree_unflatten(
        treedef_cur, [np.asarray(x) for x in flat_saved]
    )
    opt_leaves_cur, opt_treedef_cur = jax.tree_util.tree_flatten(trainer.opt_state)
    if state["opt_treedef"] != str(opt_treedef_cur) or len(
        state["opt_leaves"]
    ) != len(opt_leaves_cur):
        raise ValueError(
            "optimizer-state tree structure mismatch (different optimizer config?)"
        )
    trainer.opt_state = jax.tree_util.tree_unflatten(
        opt_treedef_cur, [np.asarray(x) for x in state["opt_leaves"]]
    )
    trainer.epoch = int(state["epoch"])
    return trainer.epoch, dict(state.get("extra", {}))
