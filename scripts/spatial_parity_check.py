"""Numerical-equivalence proof for the sharded train steps (dp and dp x sp).

Claim under test (parallel/train_step.py dp x sp branch, PARITY.md section
2.8): sharding the batch over 'data' and the BEV rows over 'spatial' — where
XLA's SPMD partitioner must insert conv halo exchanges and cross-shard
reductions — computes the SAME loss and the SAME parameter update as the
completely unsharded step on identical init + data.

Why float64: in f32 this comparison is impossible in principle — sharded
reductions reassociate float adds, the ~1e-6 forward wobble flips ReLU kinks,
and the flipped gradient masks amplify through 18 BN/ReLU layers into
percent-level update differences (measured: dp-only 6e-2, dp x sp 5e-1
worst-leaf relative — on DETERMINISTIC reruns of each mode the deviation is
exactly 0, so it is reassociation chaos, not nondeterminism). In f64 the
reassociation floor drops to ~1e-16 and kink flips vanish, so a genuine halo
or collective bug — which produces O(1) boundary-row errors at any precision
— is cleanly separated from float noise: updates must match to <= 1e-9.

Run standalone (from /root/repo):  python scripts/spatial_parity_check.py
Or via pytest: tests/test_multihost.py::test_spatial_mesh_step_matches_unsharded_step
(subprocess — x64 mode is process-global and must not leak into other tests).
"""

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.tree_util as jtu  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from sfa3d_tpu.config.train import OptimConfig  # noqa: E402
from sfa3d_tpu.models import create_model  # noqa: E402
from sfa3d_tpu.parallel import (  # noqa: E402
    create_train_state,
    make_train_step,
    replicate,
)
from sfa3d_tpu.parallel.mesh import make_mesh, make_mesh_2d  # noqa: E402
from sfa3d_tpu.pipeline import init_detector  # noqa: E402
from sfa3d_tpu.runtime.schedules import create_optimizer  # noqa: E402

LOSS_RTOL = 1e-12
UPDATE_RTOL = 1e-9


def main():
    from tests.test_train import synthetic_batch

    rng = np.random.default_rng(7)
    batch = synthetic_batch(rng, s=2, b=4, hw=64)
    # f64 end to end: integer index tensors stay integral
    batch = jtu.tree_map(
        lambda t: t.astype(np.float64) if t.dtype == np.float32 else t, batch
    )

    cfg = OptimConfig(optimizer_type="sgd", lr=1e-2, lr_type="multi_step",
                      steps=(100,))
    tx = create_optimizer(cfg, num_epochs=10, steps_per_epoch=5)
    model = create_model("fpn_resnet_18", dtype=jax.numpy.float64)
    variables = init_detector(model, jax.random.PRNGKey(0), input_size=(64, 64))
    variables = jtu.tree_map(lambda x: np.asarray(x, np.float64), variables)
    params0 = variables["params"]

    def run(mesh, spatial=False):
        state = create_train_state(model, variables, tx)
        if mesh is None:
            step = make_train_step(model, tx, mesh=None)
            new_state, stats = step(state, batch)
        else:
            step = make_train_step(model, tx, mesh)
            bev_spec = P(None, "data", "spatial") if spatial else P(None, "data")
            b = {
                "bev": jax.device_put(batch["bev"], NamedSharding(mesh, bev_spec)),
                "targets": jtu.tree_map(
                    lambda t: jax.device_put(t, NamedSharding(mesh, P(None, "data"))),
                    batch["targets"],
                ),
            }
            new_state, stats = step(replicate(mesh, state), b)
        return (
            jtu.tree_map(np.asarray, new_state.params),
            {k: float(v) for k, v in stats.items()},
        )

    params_ref, stats_ref = run(None)
    report = {"loss_unsharded": stats_ref["total_loss"]}

    for label, mesh, spatial in [
        ("dp", make_mesh(4), False),
        ("dpsp", make_mesh_2d(data=2, spatial=4), True),
    ]:
        params_m, stats_m = run(mesh, spatial)
        worst_loss = max(
            abs(stats_m[k] - stats_ref[k]) / max(abs(stats_ref[k]), 1e-300)
            for k in stats_ref
        )
        flat_ref = jtu.tree_leaves_with_path(params_ref)
        flat_m = dict(jtu.tree_leaves_with_path(params_m))
        flat_0 = dict(jtu.tree_leaves_with_path(params0))
        worst_upd, worst_leaf, checked = 0.0, None, 0
        for path, leaf_ref in flat_ref:
            upd_ref = leaf_ref - flat_0[path]
            upd_m = flat_m[path] - flat_0[path]
            scale = float(np.abs(upd_ref).max())
            if scale == 0.0:
                assert float(np.abs(upd_m).max()) == 0.0, jtu.keystr(path)
                continue
            rel = float(np.abs(upd_m - upd_ref).max()) / scale
            if rel > worst_upd:
                worst_upd, worst_leaf = rel, jtu.keystr(path)
            checked += 1
        assert checked >= 10, f"only {checked} nonzero-update leaves"
        report[f"{label}_worst_loss_rel"] = worst_loss
        report[f"{label}_worst_update_rel"] = worst_upd
        report[f"{label}_worst_update_leaf"] = worst_leaf
        assert worst_loss <= LOSS_RTOL, (label, worst_loss)
        assert worst_upd <= UPDATE_RTOL, (label, worst_upd, worst_leaf)

    report["ok"] = True
    print(json.dumps(report))


if __name__ == "__main__":
    main()
