#!/usr/bin/env python
"""Measure the fused-GAT in-kernel dropout keep rate ON HARDWARE.

The masks are drawn inside the Mosaic kernel from pltpu.prng_random_bits
(signed int32). A round-3 review found the bits->uniform transform used
an arithmetic shift, keeping ~49% at any small drop_p; the fix uses a
logical shift + 24-bit mask. This kernel dumps one drawn mask per
configured drop_p and prints its keep fraction — expected ~= 1 - p.

    python tools/experiments/gat_dropout_keeprate.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mask_kernel(drop_p: float, shape=(256, 256)):
    def kern(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0, 0])
        bits = pltpu.prng_random_bits(shape)
        u24 = jax.lax.shift_right_logical(bits, 8) & 0xFFFFFF
        u = u24.astype(jnp.float32) * (1.0 / (1 << 24))
        o_ref[...] = (u >= drop_p).astype(jnp.float32)

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))


def main():
    print("device:", jax.devices()[0])
    for p in (0.01, 0.1, 0.5):
        fn = mask_kernel(p)
        rates = []
        for seed in range(4):
            m = np.asarray(fn(jnp.asarray([[seed]], jnp.int32)))
            rates.append(m.mean())
        print(f"drop_p={p}: keep rate {np.mean(rates):.4f} "
              f"(expected {1 - p:.4f})")
        assert abs(np.mean(rates) - (1 - p)) < 0.01, rates


if __name__ == "__main__":
    main()
