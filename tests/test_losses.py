"""Loss parity vs. reference losses/losses.py (torch)."""

import numpy as np
import pytest

from tests import ref_loader
from sfa3d_tpu.losses import compute_loss
from sfa3d_tpu.models import clamped_sigmoid


def make_data(rng, b=2, h=152, w=152, k=50):
    outputs = {
        "hm_cen": rng.normal(0, 1, (b, h, w, 3)).astype(np.float32),
        "cen_offset": rng.normal(0, 1, (b, h, w, 2)).astype(np.float32),
        "direction": rng.normal(0, 1, (b, h, w, 2)).astype(np.float32),
        "z_coor": rng.normal(0, 1, (b, h, w, 1)).astype(np.float32),
        "dim": rng.normal(0, 1, (b, h, w, 3)).astype(np.float32),
    }
    n_obj = 7
    obj_mask = np.zeros((b, k), np.float32)
    obj_mask[:, :n_obj] = 1
    inds = rng.integers(0, h * w, (b, k)).astype(np.int64) * obj_mask.astype(np.int64)
    hm_gt = np.zeros((b, h, w, 3), np.float32)
    for bi in range(b):
        for j in range(n_obj):
            y, x = np.unravel_index(inds[bi, j], (h, w))
            hm_gt[bi, y, x, rng.integers(0, 3)] = 1.0
    tg = {
        "hm_cen": hm_gt,
        "cen_offset": (rng.uniform(0, 1, (b, k, 2)) * obj_mask[..., None]).astype(np.float32),
        "direction": (rng.uniform(-1, 1, (b, k, 2)) * obj_mask[..., None]).astype(np.float32),
        "z_coor": (rng.uniform(0, 4, (b, k, 1)) * obj_mask[..., None]).astype(np.float32),
        "dim": (rng.uniform(0.5, 4, (b, k, 3)) * obj_mask[..., None]).astype(np.float32),
        "indices_center": inds,
        "obj_mask": obj_mask,
    }
    return outputs, tg


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree absent")
def test_compute_loss_matches_reference(rng):
    import torch

    ref_losses = ref_loader.load("losses.losses")
    outputs, tg = make_data(rng)

    # copy() is load-bearing: the reference's _sigmoid mutates its inputs in
    # place, and np.transpose would otherwise alias our numpy arrays.
    t = lambda x: torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    ref_outputs = {k: t(v) for k, v in outputs.items()}
    ref_tg = {
        "hm_cen": t(tg["hm_cen"]),
        "cen_offset": torch.from_numpy(tg["cen_offset"]),
        "direction": torch.from_numpy(tg["direction"]),
        "z_coor": torch.from_numpy(tg["z_coor"]),
        "dim": torch.from_numpy(tg["dim"]),
        "indices_center": torch.from_numpy(tg["indices_center"]),
        "obj_mask": torch.from_numpy(tg["obj_mask"]),
    }
    ref_total, ref_stats = ref_losses.Compute_Loss(device="cpu")(ref_outputs, ref_tg)

    total, stats = compute_loss(outputs, tg)
    # relative 1e-4: the hm focal term sums ~140k log terms in float32, so an
    # absolute comparison at 1e-3 would demand 3e-7 relative accuracy
    assert float(total) == pytest.approx(float(ref_total), rel=1e-4)
    for key in ref_stats:
        assert float(stats[key]) == pytest.approx(float(ref_stats[key]), rel=1e-4, abs=1e-5), key


def test_focal_no_positives(rng):
    """num_pos == 0 branch: pure negative loss, no NaN."""
    outputs, tg = make_data(rng, b=1)
    tg["hm_cen"] = np.zeros_like(tg["hm_cen"])
    tg["obj_mask"] = np.zeros_like(tg["obj_mask"])
    total, _ = compute_loss(outputs, tg)
    assert np.isfinite(float(total))


def test_loss_gradient_flows(rng):
    import jax

    outputs, tg = make_data(rng, b=1)

    def loss_fn(outs):
        return compute_loss(outs, tg)[0]

    grads = jax.grad(loss_fn)(outputs)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
        assert np.abs(np.asarray(g)).max() > 0, k


def test_clamped_sigmoid_straight_through_gradient():
    """The clamp must not kill the recovery gradient (the saturation trap
    the Argoverse overfit pin caught): a logit below sigmoid^-1(1e-4)
    still clamps its VALUE to the floor, but a positive target at that
    cell must receive a non-zero pull-up gradient. The reference's
    torch.clamp freezes such cells forever (documented divergence,
    docs/TECHNICAL.md)."""
    import jax
    import jax.numpy as jnp

    from sfa3d_tpu.models import clamped_sigmoid

    x = jnp.float32(-12.0)  # sigmoid(-12) ~ 6e-6, far below the 1e-4 floor
    # forward: clamped exactly to the floor (reference value parity;
    # compare against the same f32 constant the clip uses)
    assert float(clamped_sigmoid(x)) == float(np.float32(1e-4))
    assert float(clamped_sigmoid(jnp.float32(12.0))) == float(
        np.float32(1.0) - np.float32(1e-4))
    # backward: plain sigmoid gradient survives the clamp
    g = jax.grad(lambda t: clamped_sigmoid(t))(x)
    expect = float(jax.grad(jax.nn.sigmoid)(x))
    assert float(g) == expect and expect > 0
    # focal loss at a sub-floor positive cell now pulls the logit UP
    from sfa3d_tpu.losses.losses import focal_loss

    hm_target = jnp.ones((1, 1, 1, 1), jnp.float32)
    grad = jax.grad(
        lambda logit: focal_loss(
            clamped_sigmoid(jnp.full((1, 1, 1, 1), logit)), hm_target)
    )(jnp.float32(-12.0))
    assert float(grad) < 0, "positive cell must push the logit up"
