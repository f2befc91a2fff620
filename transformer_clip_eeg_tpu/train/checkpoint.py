"""Orbax checkpointing with the reference's best-on-val-CE policy.

The reference saves ``model.state_dict()`` to ``checkpoints/model.ckpt``
whenever validation ``loss_ce`` improves, auto-resumes from it at startup,
and restores the in-memory best on early stop
(ref ``train_clip_final.py:443-449,463-468,531-540``).  Here the checkpoint
is the full train-state pytree (params + memory bank + batch stats + optimizer
state + step) so resume continues optimizer momentum too — strictly more than
the reference persists, saved atomically by orbax.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from transformer_clip_eeg_tpu.train.state import TrainState

CKPT_NAME = "model_ckpt"


def _state_payload(state: TrainState):
    return {
        "step": state.step,
        "params": state.params,
        "membank": state.membank,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(checkpoint_dir: str, state: TrainState) -> str:
    """Atomically (over)write ``<dir>/model_ckpt``."""
    path = os.path.abspath(os.path.join(checkpoint_dir, CKPT_NAME))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _state_payload(jax.device_get(state)), force=True)
    return path


def restore_checkpoint(
    checkpoint_dir: str, state: TrainState
) -> Optional[TrainState]:
    """Restore into the given state template; None if no checkpoint exists."""
    path = os.path.abspath(os.path.join(checkpoint_dir, CKPT_NAME))
    if not os.path.exists(path):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    try:
        restored = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(_state_payload(state))
        )
    except Exception as e:  # noqa: BLE001 — orbax raises several types here
        # incompatible checkpoint (e.g. written before an optimizer-state
        # layout change): the reference's auto-resume would also fail to
        # load; start fresh instead of crashing mid-run
        print(
            f"checkpoint at {path} is incompatible with the current state "
            f"layout ({type(e).__name__}); training from scratch"
        )
        return None
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        membank=restored["membank"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


BEST_META_NAME = "best_meta.json"


def save_best_meta(checkpoint_dir: str, best_loss: float) -> None:
    """Record the val loss_ce the best checkpoint was saved at, so a resumed
    run knows the bar to beat instead of overwriting the saved best with its
    first (possibly worse) post-resume epoch.

    Written atomically (temp file + ``os.replace``) and callers write it
    BEFORE ``save_checkpoint``: a crash between the two then leaves a bar
    that is lower than the on-disk checkpoint's quality, which keeps the old
    checkpoint (conservative) rather than the reverse ordering's stale-high
    bar that lets a worse model overwrite a better saved one.
    """
    import json

    path = os.path.join(checkpoint_dir, BEST_META_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"best_loss": float(best_loss)}, f)
    os.replace(tmp, path)


def load_best_meta(checkpoint_dir: str) -> Optional[float]:
    """Best val loss_ce recorded next to the checkpoint; None if absent."""
    import json

    path = os.path.join(checkpoint_dir, BEST_META_NAME)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return float(json.load(f)["best_loss"])
    except (ValueError, KeyError, OSError):
        return None


TORCH_CKPT_NAME = "model.ckpt"


def restore_torch_checkpoint(
    checkpoint_dir: str, state: TrainState
) -> Optional[TrainState]:
    """Ingest a reference torch ``checkpoints/model.ckpt`` into the state.

    The reference driver loads such a state_dict both at auto-resume
    (ref ``train_clip_final.py:443-449``) and in eval mode (``:541-556``);
    this is the TPU-side equivalent: the state_dict is converted
    (``utils.torch_import``) against the initialized state's variable tree
    and overlaid with partial-load semantics.  Returns None when no torch
    checkpoint exists.
    """
    path = os.path.join(checkpoint_dir, TORCH_CKPT_NAME)
    if not os.path.exists(path):
        return None
    import jax.numpy as jnp

    from transformer_clip_eeg_tpu.utils.torch_import import (
        load_torch_state_dict,
    )

    template = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "membank": jax.device_get(state.membank),
    }
    merged, report = load_torch_state_dict(path, template)
    for item in report:
        print(f"torch checkpoint: skipped {item}")
    as_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)
    return state.replace(
        params=as_jnp(merged["params"]),
        batch_stats=as_jnp(merged["batch_stats"]),
        membank=as_jnp(merged["membank"]),
    )


def save_params_only(path: str, variables: Any) -> None:
    """Save bare model variables (the probe checkpoints' analogue of the
    reference's per-subject ``.pth`` files,
    ref ``train_clip_helper_functions.py:660-663``)."""
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(variables), force=True)


def restore_params_only(path: str, template: Any = None) -> Any:
    """Restore bare variables; with ``template=None`` the tree structure is
    read from the checkpoint itself."""
    ckptr = ocp.PyTreeCheckpointer()
    if template is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(
        os.path.abspath(path), args=ocp.args.PyTreeRestore(template)
    )
