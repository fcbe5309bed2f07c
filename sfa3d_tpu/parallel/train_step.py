"""Sharded training / eval steps.

Replaces the reference's training inner loop (train.py:190-247):
- DDP backward all-reduce        -> jit over the mesh; XLA inserts psums.
- gradient accumulation
  ("subdivisions", train.py:84-86,219-222) -> lax.scan over stacked
  micro-batches with SUMMED gradients (torch `.backward()` accumulates sums,
  so parity requires sum, not mean).
- loss reduce_tensor logging     -> the loss is already a global mean under
  jit's global-view semantics.

BatchNorm note: under a data-sharded jit, BN batch statistics are computed
over the GLOBAL batch (XLA turns the reduction into a cross-chip psum) —
stronger than torch DDP's per-device BN; documented divergence.

Loss-normalization note (same mechanism): the focal / L1 losses normalize
by the GLOBAL positive/object count, whereas reference DDP normalizes
per-device and then averages gradients — when object counts are unbalanced
across shards, DDP up-weights objects on sparse devices while we weight
every object equally. Documented divergence (docs/TECHNICAL.md); the
global form is the textbook CenterNet objective.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from sfa3d_tpu.losses import compute_loss
from sfa3d_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # Exponential moving average of params (None when EMA is disabled).
    # Beyond-reference: the reference trains/evaluates raw weights only;
    # EMA is the standard modern-detector stabilizer (kept as an opt-in,
    # --ema_decay) and the deliverable weights when enabled.
    ema_params: Any = None


def create_train_state(
    model, variables, tx: optax.GradientTransformation, ema: bool = False
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        # seeded at the current weights: the first updates then move it
        # quickly because the ramped decay starts near 0 (see ema_decay_at).
        # A REAL copy, not an alias — the train step donates its input
        # state, and aliased params/ema leaves would be donated twice.
        ema_params=(jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                           params) if ema else None),
    )


def ema_decay_at(step, decay: float, tau: float = 2000.0):
    """Ramped EMA decay (ultralytics ModelEMA schedule): d(t) =
    decay * (1 - exp(-t / tau)). Early steps track the raw weights almost
    1:1 (no stale-random-init bias); late steps converge to `decay`."""
    return decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))


def _loss_and_updates(model, params, batch_stats, bev, targets):
    outputs, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        bev,
        train=True,
        mutable=["batch_stats"],
    )
    total, stats = compute_loss(outputs, targets)
    return total, (stats, mutated["batch_stats"])


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh=None,
    ema_decay: float = 0.0,
    ema_tau: float = 2000.0,
) -> Callable:
    """Build the jitted train step.

    The step takes (state, batch) where batch is a dict:
      bev:     (S, B, H, W, 3) float32  — S gradient-accumulation slices
      targets: dict of (S, B, ...) target tensors
    and returns (new_state, stats). With a mesh, B is sharded over 'data'
    and state is replicated. With ema_decay > 0 (state must carry
    ema_params), the step also advances the parameter EMA in-jit — one
    fused elementwise pass, negligible next to the backward.
    """

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        def micro(carry, xs):
            grads_acc, stats_acc, bstats = carry
            bev, targets = xs
            (_, (stats, new_bstats)), grads = jax.value_and_grad(
                lambda p: _loss_and_updates(model, p, bstats, bev, targets),
                has_aux=True,
            )(state.params)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            stats_acc = jax.tree_util.tree_map(jnp.add, stats_acc, stats)
            return (grads_acc, stats_acc, new_bstats), None

        zeros_like = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
        bev = batch["bev"]
        targets = batch["targets"]
        n_micro = bev.shape[0]
        # stats are computed in at-least-f32 (losses.py _at_least_f32); the
        # scan carry must match (f64 in the numerics-audit mode)
        stat_dt = jnp.promote_types(bev.dtype, jnp.float32)
        init_stats = {
            k: jnp.zeros((), stat_dt)
            for k in (
                "total_loss", "hm_cen_loss", "cen_offset_loss",
                "dim_loss", "direction_loss", "z_coor_loss",
            )
        }
        (grads, stats, new_bstats), _ = jax.lax.scan(
            micro,
            (zeros_like(state.params), init_stats, state.batch_stats),
            (bev, targets),
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        stats = jax.tree_util.tree_map(lambda s: s / n_micro, stats)
        new_ema = state.ema_params
        if ema_decay > 0.0:
            if new_ema is None:
                raise ValueError(
                    "ema_decay > 0 requires create_train_state(..., ema=True)"
                )
            d = ema_decay_at(state.step + 1, ema_decay, ema_tau)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e + (1.0 - d) * (p.astype(e.dtype) - e),
                new_ema, new_params,
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bstats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, stats

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)

    repl = NamedSharding(mesh, P())
    if SPATIAL_AXIS in mesh.axis_names:
        # Shardy-partitioner correctness bug (jax 0.9.0, default
        # jax_use_shardy_partitioner=True): under a spatial-sharded batch,
        # the backward of a stride-2 conv+BatchNorm block whose feature map
        # is smaller than the shard count (the backbone's layer4 at 608^2 /
        # 32) produces kernel gradients EXACTLY 2x the correct value
        # (isolated repro + f64 proof: scripts/spatial_parity_check.py;
        # classic GSPMD is exact to 1e-13). Force the classic partitioner
        # before this step is first traced. Process-global by necessity —
        # the flag is read at lowering time; classic GSPMD was the default
        # partitioner before Shardy and is safe for every other jit here.
        if jax.config.jax_use_shardy_partitioner:
            jax.config.update("jax_use_shardy_partitioner", False)
        # combined data + spatial parallelism: batch over 'data', BEV rows
        # over 'spatial' (XLA inserts conv halo exchanges); the flat target
        # tensors only shard the batch axis.
        bev_sharding = NamedSharding(mesh, P(None, DATA_AXIS, SPATIAL_AXIS))
        tgt_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
        # in_shardings accepts a pytree prefix: one sharding covers the
        # whole targets subtree
        jitted = jax.jit(
            step_fn,
            donate_argnums=0,
            in_shardings=(repl, {"bev": bev_sharding, "targets": tgt_sharding}),
            out_shardings=(repl, repl),
        )
        return jitted

    data = NamedSharding(mesh, P(None, DATA_AXIS))  # (S, B, ...) shard B
    return jax.jit(
        step_fn,
        donate_argnums=0,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
    )


def make_eval_step(model, mesh=None) -> Callable:
    """Validation loss (reference validate, train.py:250-274): BN in eval
    mode, no grads. batch: bev (B, H, W, 3), targets (B, ...)."""

    def step_fn(state: TrainState, batch) -> Dict[str, jax.Array]:
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["bev"],
            train=False,
        )
        total, stats = compute_loss(outputs, batch["targets"])
        return stats

    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=repl)
