"""Checkpoint / resume via Orbax.

Replaces the reference's paired torch files
`Model_{fn}_epoch_{e}.pth` + `Utils_{fn}_epoch_{e}.pth`
(utils/train_utils.py:80-104, train.py:104-132) with a single composite
Orbax checkpoint holding params + batch_stats + opt_state + step + epoch.
Reference-trained .pth checkpoints are importable via models/port.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from sfa3d_tpu.parallel.train_step import TrainState


def save_checkpoint(checkpoints_dir: str, saved_fn: str, state: TrainState, epoch: int):
    """Save a full training checkpoint for `epoch` (train_utils.py:96-104)."""
    path = os.path.abspath(
        os.path.join(checkpoints_dir, f"Model_{saved_fn}_epoch_{epoch}")
    )
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": np.asarray(epoch, np.int32),
    }
    if state.ema_params is not None:
        # EMA weights ride in the same composite checkpoint (the deliverable
        # weights of an --ema_decay run; restored by --use_ema consumers)
        payload["ema_params"] = state.ema_params
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def prune_checkpoints(checkpoints_dir: str, saved_fn: str, keep_last: int):
    """Delete all but the newest `keep_last` epoch checkpoints (the
    reference keeps every epoch's .pth pair; production runs cap disk)."""
    if keep_last <= 0:
        return
    import re
    import shutil

    prefix = f"Model_{saved_fn}_epoch_"
    found = []
    for name in os.listdir(checkpoints_dir):
        m = re.fullmatch(re.escape(prefix) + r"(\d+)", name)
        if m:
            found.append((int(m.group(1)), name))
    for _, name in sorted(found)[:-keep_last]:
        shutil.rmtree(os.path.join(checkpoints_dir, name), ignore_errors=True)


def load_checkpoint(path: str, template_state: TrainState, epoch_hint: int = 0):
    """Restore (state, epoch). `template_state` supplies the pytree structure
    and shardings (reference resume flow, train.py:111-132).

    EMA compatibility is resolved against the template, both ways:
    - template wants EMA but the checkpoint predates --ema_decay -> the EMA
      is re-seeded from the restored raw params (the ramped decay then
      re-converges it);
    - template has no EMA but the checkpoint carries one -> the stored EMA
      is dropped (a run resumed WITHOUT --ema_decay stops tracking it).
    """
    ckptr = ocp.StandardCheckpointer()
    template = {
        "step": template_state.step,
        "params": template_state.params,
        "batch_stats": template_state.batch_stats,
        "opt_state": template_state.opt_state,
        "epoch": np.asarray(epoch_hint, np.int32),
    }
    want_ema = template_state.ema_params is not None
    if want_ema:
        template["ema_params"] = template_state.ema_params
    try:
        restored = ckptr.restore(os.path.abspath(path), template)
    except Exception as first_err:
        # structure mismatch: toggle the ema_params item and retry (EMA
        # trees are params-shaped, so the params template stands in)
        if want_ema:
            template.pop("ema_params")
        else:
            template["ema_params"] = template_state.params
        try:
            restored = ckptr.restore(os.path.abspath(path), template)
        except Exception:
            # the checkpoint is genuinely unreadable, not an EMA-shape
            # mismatch: surface the ORIGINAL diagnostic
            raise first_err from None
    ema = None
    if want_ema:
        ema = restored.get("ema_params")
        if ema is None:
            # pre-EMA checkpoint + EMA template: seed from the restored raw
            # params with a REAL copy — the donated train step
            # (donate_argnums=0) would otherwise donate the aliased
            # params/ema buffers twice (same hazard as create_train_state)
            ema = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), restored["params"]
            )
    state = template_state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        ema_params=ema,
    )
    return state, int(restored["epoch"])


def load_params_only(path: str, use_ema: bool = False) -> dict:
    """Restore just {'params', 'batch_stats'} from a composite checkpoint
    without needing the optimizer-state template (inference-side loads,
    e.g. the Detector facade). With use_ema, the EMA weights saved by an
    --ema_decay run are returned as the params (BN statistics stay the raw
    run's running stats — those are already their own moving average)."""
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    params = restored["params"]
    if use_ema:
        if "ema_params" not in restored:
            raise ValueError(
                f"use_ema requested but {path} holds no ema_params "
                "(was the run trained with --ema_decay?)"
            )
        params = restored["ema_params"]
    return {
        "params": params,
        "batch_stats": restored.get("batch_stats", {}),
    }


def load_pretrained_params(state: TrainState, variables: dict) -> TrainState:
    """Weights-only load (reference --pretrained_path, train.py:104-108):
    keep optimizer state, replace params/batch_stats."""
    return state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", state.batch_stats),
    )


def latest_checkpoint(checkpoints_dir: str, saved_fn: str) -> Optional[str]:
    if not os.path.isdir(checkpoints_dir):
        return None
    prefix = f"Model_{saved_fn}_epoch_"
    epochs = []
    for name in os.listdir(checkpoints_dir):
        if name.startswith(prefix):
            try:
                epochs.append(int(name[len(prefix):]))
            except ValueError:
                continue
    if not epochs:
        return None
    return os.path.join(checkpoints_dir, f"{prefix}{max(epochs)}")
