"""Scratch: isolate the SWAR int4 unpack Mosaic failure."""
import sys
import traceback

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(w_ref, lo_ref, hi_ref):
    w = w_ref[...]
    p32 = pltpu.bitcast(w, jnp.int32)
    m = jnp.int32(0x0F0F0F0F)
    lo32 = p32 & m
    hi32 = jax.lax.shift_right_logical(p32, jnp.int32(4)) & m
    lo = pltpu.bitcast(lo32, jnp.int8)
    hi = pltpu.bitcast(hi32, jnp.int8)
    eight = jnp.int8(8)
    lo_ref[...] = (lo ^ eight) - eight
    hi_ref[...] = (hi ^ eight) - eight


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-128, 128, (128, 512), np.int8))
    try:
        lo, hi = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((128, 512), jnp.int8)] * 2,
        )(w)
        lo, hi = np.asarray(lo), np.asarray(hi)
        p = np.asarray(w).astype(np.int32)
        tl = ((p << 28) >> 28).astype(np.int8)
        th = (p >> 4).astype(np.int8)
        print("lo exact:", np.array_equal(lo, tl))
        print("hi exact:", np.array_equal(hi, th))
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
