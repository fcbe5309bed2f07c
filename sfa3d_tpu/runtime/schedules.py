"""LR / momentum schedules and optimizer factory (optax).

Parity with reference utils/train_utils.py:29-77 and utils/lr_scheduler.py:
- 'multi_step': factors 1 / 0.1 / 0.01 at configured epoch steps.
- 'cosin':      lr * (((1+cos(pi*e/N))/2) * 0.9 + 0.1)   (bag-of-tricks).
- 'one_cycle':  Leslie Smith 1-cycle over epochs: lr/10 -> lr -> lr/10 ->
  lr/100 with the inverse momentum cycle over [0.85, 0.95], phase_ratio 0.45
  (lr_scheduler.py:253-312).
Schedules are functions of EPOCH (the reference steps LambdaLR once per
epoch); `epoch_of_step` converts optax's step counter.

Optimizers (train_utils.py:29-46): SGD(momentum=0.949, nesterov) or
Adam(weight_decay as L2). Momentum is schedule-driven for one_cycle via
optax.inject_hyperparams.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp
import optax

from sfa3d_tpu.config.train import OptimConfig


def create_lr_schedule(cfg: OptimConfig, num_epochs: int, steps_per_epoch: int) -> Callable:
    """Returns optax schedule: optimizer-step count -> lr."""
    phase_epochs = int(0.45 * num_epochs)

    def epoch_of(step):
        return jnp.minimum(step // max(1, steps_per_epoch), num_epochs - 1)

    if cfg.lr_type == "multi_step":
        s0, s1 = (cfg.steps + (num_epochs, num_epochs))[:2]

        def sched(step):
            e = epoch_of(step)
            factor = jnp.where(e < s0, 1.0, jnp.where(e < s1, 0.1, 0.01))
            return cfg.lr * factor

    elif cfg.lr_type == "cosin":

        def sched(step):
            e = epoch_of(step)
            return cfg.lr * (
                ((1.0 + jnp.cos(e * math.pi / num_epochs)) / 2.0) * 0.9 + 0.1
            )

    elif cfg.lr_type == "one_cycle":

        def sched(step):
            e = epoch_of(step).astype(jnp.float32)
            up = cfg.lr * 0.1 + (cfg.lr - cfg.lr * 0.1) * e / max(1, phase_epochs - 1)
            down = cfg.lr - (cfg.lr - cfg.lr * 0.1) * (e - phase_epochs) / max(
                1, phase_epochs - 1
            )
            tail_len = max(1, num_epochs - 2 * phase_epochs - 1)
            tail = cfg.lr * 0.1 + (cfg.lr * 0.01 - cfg.lr * 0.1) * (
                e - 2 * phase_epochs
            ) / tail_len
            return jnp.where(
                e < phase_epochs, up, jnp.where(e < 2 * phase_epochs, down, tail)
            )

    else:
        raise ValueError(f"unknown lr_type: {cfg.lr_type}")

    return sched


def create_momentum_schedule(cfg: OptimConfig, num_epochs: int, steps_per_epoch: int) -> Optional[Callable]:
    """Inverse momentum cycle for one_cycle (lr_scheduler.py:289-306);
    None for the other schedulers (constant momentum)."""
    if cfg.lr_type != "one_cycle":
        return None
    phase_epochs = int(0.45 * num_epochs)
    m_lo, m_hi = 0.85, 0.95

    def sched(step):
        e = jnp.minimum(step // max(1, steps_per_epoch), num_epochs - 1).astype(jnp.float32)
        down = m_hi + (m_lo - m_hi) * e / max(1, phase_epochs - 1)
        up = m_lo + (m_hi - m_lo) * (e - phase_epochs) / max(1, phase_epochs - 1)
        return jnp.where(e < phase_epochs, down, jnp.where(e < 2 * phase_epochs, up, m_hi))

    return sched


def range_finder_schedule(num_epochs: int, lr_min: float = 1e-7, lr_max: float = 1.0,
                          steps_per_epoch: int = 1) -> Callable:
    """Log-space LR sweep for learning-rate range tests (RangeFinder,
    lr_scheduler.py:227-250): epoch e gets 10^(lerp(log10 lr_min, log10
    lr_max)). Run a short training with this schedule and pick the LR where
    the loss drops fastest. Like the sibling schedules, the input is the
    optimizer STEP counter and is converted to an epoch index."""
    import numpy as np

    lrs = np.logspace(math.log10(lr_min), math.log10(lr_max), num_epochs)

    def sched(step):
        e = jnp.clip(step // max(1, steps_per_epoch), 0, num_epochs - 1)
        return jnp.asarray(lrs)[e]

    return sched


def create_optimizer(cfg: OptimConfig, num_epochs: int, steps_per_epoch: int) -> optax.GradientTransformation:
    """Optimizer + schedule bundle (train_utils.py:29-77)."""
    lr = create_lr_schedule(cfg, num_epochs, steps_per_epoch)
    if cfg.optimizer_type == "sgd":
        mom = create_momentum_schedule(cfg, num_epochs, steps_per_epoch)
        if mom is not None:
            @optax.inject_hyperparams
            def make(learning_rate, momentum):
                return optax.sgd(learning_rate, momentum=momentum, nesterov=True)

            return make(learning_rate=lr, momentum=mom)
        return optax.sgd(lr, momentum=cfg.momentum, nesterov=True)
    if cfg.optimizer_type == "adam":
        tx = optax.adam(lr)
        if cfg.weight_decay > 0:
            # torch Adam's weight_decay is L2 added to the gradient.
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
        return tx
    raise ValueError(f"unknown optimizer type: {cfg.optimizer_type}")
