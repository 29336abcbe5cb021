"""Microbenchmark: sublane padding of the jet tower's channel tensors.

The round-3 roofline (PERF_NOTES.md) measured the big elementwise fusions on
``[c, B, T, D] = [13, 3360, 6, 256]`` jet tensors at ~450 of 819 GB/s. If XLA
keeps the logical minor dims as the physical tile dims, the ``(T=6, D=256)``
tile uses 6 of 8 sublanes — 25% padding on every access. This measures the
same LayerNorm-like chain on the token-major permutation ``[c, T, B, D]``
(tile ``(B, D)``, no padding) to decide whether a tower-layout experiment is
worth building.

    python scripts/bench_sublane_layout.py          # on the TPU
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def chain(x):
    # LayerNorm-flavoured elementwise+reduction chain over the minor axis:
    # the shape class that dominates the jet tower's device time.
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + 1e-5)
    return y + x


def measure(shape, iters=30):
    f = jax.jit(lambda x: chain(chain(x)))
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    y = f(x)
    jax.block_until_ready(y)
    rates = []
    for _ in range(3):
        start = time.perf_counter()
        y = x
        for _ in range(iters):
            y = f(y)
        float(jax.device_get(jnp.sum(y[..., 0, 0])))
        elapsed = time.perf_counter() - start
        # 2 chains x (read + write) of the full tensor per call, roughly.
        nbytes = x.size * 4
        rates.append(iters * 4 * nbytes / elapsed / 1e9)
    return sorted(rates)[1]


def main() -> None:
    from deephall_tpu.utils import setup_runtime

    setup_runtime()
    bt = measure((13, 3360, 6, 256))
    tb = measure((13, 6, 3360, 256))
    print(f"batch-major [13,3360,6,256]: {bt:.0f} GB/s effective")
    print(f"token-major [13,6,3360,256]: {tb:.0f} GB/s effective")
    print(f"token-major / batch-major: {tb / bt:.3f}")


if __name__ == "__main__":
    main()
