"""Stochastic rounding f32 -> bf16.

bf16 is exactly the top 16 bits of an f32, so unbiased stochastic
rounding is a bit trick: add a uniform 16-bit integer to the f32 bit
pattern and truncate the low mantissa bits. E[round(x)] == x, which is
what makes bf16 optimizer state safe: with round-to-nearest, small
updates (|dw| < ulp(w)/2) are ALWAYS lost — e.g. Adagrad's accumulator
stops growing once g^2 < ulp(accum)/2 — while SR applies them with
probability dw/ulp, preserving the drift in expectation.

Used by the lazy sparse-table path (train/sparse.py) when
--param_dtype=bfloat16 stores tables and moments in bf16 (halving their
HBM footprint at multi-million-row vocab); row math stays f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """Unbiased f32 -> bf16. NaN/inf pass through (the +noise carry can
    never cross from a finite exponent into inf: 0x7F7FFFFF + 0xFFFF
    saturates to inf, which is the correct SR-up outcome)."""
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    noise = jax.random.bits(key, shape=x.shape, dtype=jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)


def maybe_round(x: jax.Array, key: jax.Array, dtype) -> jax.Array:
    """Round to `dtype`: stochastic for bf16, plain astype otherwise."""
    if dtype == jnp.bfloat16:
        return stochastic_round_bf16(x, key)
    return x.astype(dtype)
