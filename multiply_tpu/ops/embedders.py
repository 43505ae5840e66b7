"""NeRF positional (Fourier) encoding as a pure function.

Parity target: code/lib/model/embedders.py — include_input=True, log-spaced
frequencies 2^0..2^(multires-1), sin & cos per frequency. Feature order matches
the reference: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...], with
each term keeping the full input dimensionality.
"""

from __future__ import annotations

import jax.numpy as jnp


def embedding_dim(multires: int, input_dims: int = 3) -> int:
    if multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """(..., D) -> (..., D*(1+2*multires)). multires<=0 is identity."""
    if multires <= 0:
        return x
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)  # (L,)
    xb = x[..., None, :] * freqs[:, None]  # (..., L, D)
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)  # (..., L, 2, D)
    enc = enc.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, enc], axis=-1)
