"""Pallas BEV count kernel (interpret mode on the CPU test backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pallas_count_matches_scatter(rng, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from sfa3d_tpu.ops import bev_pallas

    B, N = 2, 1024
    row = rng.integers(0, 608, (B, N)).astype(np.int32)
    col = rng.integers(0, 608, (B, N)).astype(np.int32)
    inv = rng.random((B, N)) < 0.3
    row[inv] = -1
    col[inv] = -1

    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            bev_pallas.bev_cell_counts(jnp.asarray(row), jnp.asarray(col))
        )
    ref = np.zeros((B, 608, 608), np.float32)
    for b in range(B):
        m = row[b] >= 0
        np.add.at(ref[b], (row[b][m], col[b][m]), 1.0)
    np.testing.assert_array_equal(out, ref)
