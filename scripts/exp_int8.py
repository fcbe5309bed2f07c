"""Feasibility probe: does XLA map int8 conv/matmul to the v5e's double-rate
int8 MXU path from JAX? Times representative shapes (the KFPN head-tower
conv and a big matmul) in bf16 vs int8 with chained-scalar timing.

If int8 is ~2x bf16, an int8 PTQ serving mode is worth building; if not,
this file records the negative result.

RESULT (TPU v5 lite, batch 32): NEGATIVE — int8 is not faster through XLA
on this chip:
  matmul (184832, 2304)@(2304, 512): bf16 1.545 ms, int8 2.128 ms
  conv 3x3 128->64 @ 152^2:          bf16 2.051 ms, int8 2.110 ms
The int8 path gains nothing (and loses on the matmul), so the planned PTQ
serving mode is not built; bf16 remains the fast mode.

  python scripts/exp_int8.py [--batch 32]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_chained(fn, args, iters=16):
    @jax.jit
    def step(args, fb):
        out = fn(*args, fb)
        return out.reshape(-1)[0].astype(jnp.float32) * 0.0

    fb = step(args, jnp.float32(0))
    _ = float(fb)
    t0 = time.perf_counter()
    for _ in range(iters):
        fb = step(args, fb)
    _ = float(fb)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    b = args.batch
    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0]), "batch": b}

    # --- matmul: (b*5776, 2304) @ (2304, 512) — like an im2col'd head conv
    M, K, N = b * 5776, 2304, 512
    a_f = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32))

    def mm(dtype, acc):
        A = (a_f * 10).astype(dtype)
        B = jnp.asarray((rng.normal(0, 1, (K, N)) * 10).astype(dtype))

        def f(A, B, fb):
            return jax.lax.dot_general(
                A + fb.astype(dtype), B,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc,
            )

        return time_chained(f, (A, B))

    out["matmul_bf16_ms"] = round(mm(jnp.bfloat16, jnp.float32) * 1e3, 3)
    try:
        out["matmul_int8_ms"] = round(mm(jnp.int8, jnp.int32) * 1e3, 3)
    except Exception as e:
        out["matmul_int8_error"] = str(e)[:200]

    # --- conv: 3x3, 128 -> 64 at 152^2 (the KFPN head-tower shape)
    x_f = jnp.asarray(rng.normal(0, 1, (b, 152, 152, 128)).astype(np.float32))

    def conv(dtype, acc):
        X = (x_f * 10).astype(dtype)
        W = jnp.asarray((rng.normal(0, 1, (3, 3, 128, 64)) * 10).astype(dtype))

        def f(X, W, fb):
            return jax.lax.conv_general_dilated(
                X + fb.astype(dtype), W, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc,
            )

        return time_chained(f, (X, W))

    out["conv_bf16_ms"] = round(conv(jnp.bfloat16, jnp.float32) * 1e3, 3)
    try:
        out["conv_int8_ms"] = round(conv(jnp.int8, jnp.int32) * 1e3, 3)
    except Exception as e:
        out["conv_int8_error"] = str(e)[:200]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
