"""One process of a TRUE multi-process training smoke (the reference's
multi-node DDP launch, train.py:58-86, as a jax.distributed run).

Launch N copies (distinct SFA3D_PROCESS_ID), e.g.:

  for i in 0 1; do
    SFA3D_DIST=1 SFA3D_COORDINATOR=127.0.0.1:8476 \
    SFA3D_NUM_PROCESSES=2 SFA3D_PROCESS_ID=$i \
    python scripts/multihost_smoke.py &
  done; wait

Each process contributes one CPU device and its OWN local slice of the
global batch (shard_batch assembles them via
make_array_from_process_local_data); the sharded train step runs the same
global program everywhere, so every process must print IDENTICAL losses.
Prints one JSON line. Driven by tests/test_multihost.py::test_true_two_process_run.
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from sfa3d_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_step,
        maybe_init_distributed,
        replicate,
        shard_batch,
    )

    assert maybe_init_distributed(), "SFA3D_DIST not set"
    nproc = int(os.environ["SFA3D_NUM_PROCESSES"])
    pid = jax.process_index()
    assert jax.process_count() == nproc, (jax.process_count(), nproc)

    import jax.numpy as jnp

    from sfa3d_tpu.config.train import OptimConfig
    from sfa3d_tpu.models import create_model
    from sfa3d_tpu.pipeline import init_detector
    from sfa3d_tpu.runtime.schedules import create_optimizer

    hw, hm, k = 64, 16, 8
    b_local = 2  # per-process batch; global = nproc * b_local
    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(0), input_size=(hw, hw))
    tx = create_optimizer(OptimConfig(), num_epochs=2, steps_per_epoch=4)
    mesh = make_mesh(None)
    state = replicate(mesh, create_train_state(model, variables, tx))
    step = make_train_step(model, tx, mesh)

    # deterministic per-process local slice of the global batch (the
    # EpochSampler process sharding delivers this in the real loader)
    rng = np.random.default_rng(100 + pid)
    obj_mask = np.zeros((1, b_local, k), np.float32)
    obj_mask[..., :2] = 1
    hm_gt = np.zeros((1, b_local, hm, hm, 3), np.float32)
    hm_gt[:, :, 4, 4, 0] = 1.0
    batch = {
        "bev": rng.uniform(0, 1, (1, b_local, hw, hw, 3)).astype(np.float32),
        "targets": {
            "hm_cen": hm_gt,
            "cen_offset": rng.uniform(0, 1, (1, b_local, k, 2)).astype(np.float32),
            "direction": rng.uniform(-1, 1, (1, b_local, k, 2)).astype(np.float32),
            "z_coor": rng.uniform(0, 4, (1, b_local, k, 1)).astype(np.float32),
            "dim": rng.uniform(0.5, 4, (1, b_local, k, 3)).astype(np.float32),
            "indices_center": rng.integers(0, hm * hm, (1, b_local, k)).astype(np.int64),
            "obj_mask": obj_mask,
        },
    }
    sharded = shard_batch(mesh, batch, axis=1)

    losses = []
    for _ in range(3):
        state, stats = step(state, sharded)
        losses.append(round(float(stats["total_loss"]), 6))

    print(json.dumps({
        "process": pid,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "losses": losses,
    }), flush=True)


if __name__ == "__main__":
    main()
