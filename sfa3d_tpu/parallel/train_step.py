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


def create_train_state(model, variables, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


def _loss_and_updates(model, params, batch_stats, bev, targets):
    outputs, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        bev,
        train=True,
        mutable=["batch_stats"],
    )
    total, stats = compute_loss(outputs, targets)
    return total, (stats, mutated["batch_stats"])


def make_train_step(model, tx: optax.GradientTransformation, mesh=None) -> Callable:
    """Build the jitted train step.

    The step takes (state, batch) where batch is a dict:
      bev:     (S, B, H, W, 3) float32  — S gradient-accumulation slices
      targets: dict of (S, B, ...) target tensors
    and returns (new_state, stats). With a mesh, B is sharded over 'data'
    and state is replicated.
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
        init_stats = {
            k: jnp.zeros((), jnp.float32)
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
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bstats,
            opt_state=new_opt_state,
        )
        return new_state, stats

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)

    repl = NamedSharding(mesh, P())
    if SPATIAL_AXIS in mesh.axis_names:
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
