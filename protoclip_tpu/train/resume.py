"""Full training-state checkpointing (params + optimizer state + epoch).

The reference has no optimizer-state or epoch resume — its "resume" is
re-reading feature caches (SURVEY.md §5).  Production training needs real
preemption recovery, so trainers can snapshot their complete state and resume
bit-exactly: the episodic trainer derives its episode RNG from
``(seed, epoch index)`` inside ``run_epoch``, so a resumed run samples the
exact same episodes as an uninterrupted one.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_train_state(path: str, trainer) -> None:
    """Snapshot a trainer (EpisodicTrainer or QTTrainer) to ``path``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state: Dict[str, Any] = {
        "params": _to_host(trainer.params),
        "opt_state": _to_host(trainer.opt_state),
        "epoch": trainer.epoch,
        "kind": type(trainer).__name__,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(state, fh, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_train_state(path: str, trainer) -> int:
    """Restore a snapshot into a trainer; returns the epoch to resume from.

    The optimizer-state pytree structure must match (same config); params
    are transferred to device lazily on the next step.
    """
    with open(path, "rb") as fh:
        state = pickle.load(fh)
    if state["kind"] != type(trainer).__name__:
        raise ValueError(
            f"checkpoint is for {state['kind']}, trainer is {type(trainer).__name__}"
        )
    flat_saved, treedef_saved = jax.tree_util.tree_flatten(state["params"])
    flat_cur, treedef_cur = jax.tree_util.tree_flatten(trainer.params)
    if treedef_saved != treedef_cur:
        raise ValueError("parameter tree structure mismatch (different config?)")
    trainer.params = jax.tree_util.tree_unflatten(
        treedef_cur, [np.asarray(x) for x in flat_saved]
    )
    opt_saved = jax.tree_util.tree_structure(state["opt_state"])
    opt_cur = jax.tree_util.tree_structure(trainer.opt_state)
    if opt_saved != opt_cur:
        raise ValueError(
            "optimizer-state tree structure mismatch (different optimizer config?)"
        )
    trainer.opt_state = state["opt_state"]
    trainer.epoch = int(state["epoch"])
    return trainer.epoch
