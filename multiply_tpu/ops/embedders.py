"""NeRF positional (Fourier) encoding as a pure function.

Parity target: code/lib/model/embedders.py — include_input=True, log-spaced
frequencies 2^0..2^(multires-1), sin & cos per frequency. Feature order matches
the reference: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...], with
each term keeping the full input dimensionality.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def embedding_dim(multires: int, input_dims: int = 3) -> int:
    if multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


@lru_cache(maxsize=None)
def _pe_proj(multires: int, d: int):
    """Block-diagonal projection + phase for one-matmul PE: column 2l*D+i is
    sin(2^l x_i), column (2l+1)*D+i is cos via sin(z + pi/2)."""
    B = np.zeros((d, 2 * multires * d), np.float32)
    c = np.zeros((2 * multires * d,), np.float32)
    for l in range(multires):
        for i in range(d):
            B[i, (2 * l) * d + i] = 2.0**l
            B[i, (2 * l + 1) * d + i] = 2.0**l
            c[(2 * l + 1) * d + i] = np.pi / 2
    return B, c


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """(..., D) -> (..., D*(1+2*multires)). multires<=0 is identity.

    TPU note: computed as one (N, D) @ (D, 2LD) matmul + phase-shifted sine —
    the textbook (..., L, 2, D) broadcast/stack/reshape puts D=3 in the
    128-lane tile dim (~42x padding waste, profiled ~3 ms/step)."""
    if multires <= 0:
        return x
    B, c = _pe_proj(multires, x.shape[-1])
    enc = jnp.sin(x @ jnp.asarray(B, x.dtype) + jnp.asarray(c, x.dtype))
    return jnp.concatenate([x, enc], axis=-1)
