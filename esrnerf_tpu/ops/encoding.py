"""Sin/cos positional encodings (reference: ``voxurfc.py:119-123,225-235``)."""

from __future__ import annotations

import jax.numpy as jnp


def freqs(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """[2^0, 2^1, ..., 2^(n-1)]."""
    return jnp.asarray([2.0**i for i in range(n)], dtype=dtype)


def posenc(x: jnp.ndarray, n_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """``[x, sin(x*2^i)..., cos(x*2^i)...]`` over the last axis.

    Matches the reference's embedding: ``emb = (x[..., None] * freq)``
    flattened, then ``cat([x, emb.sin(), emb.cos()])``. Output dim =
    ``d * (1 + 2*n_freqs)`` (or ``d * 2 * n_freqs`` without input).
    """
    if n_freqs == 0:
        return x if include_input else x[..., :0]
    emb = (x[..., None] * freqs(n_freqs, x.dtype)).reshape(*x.shape[:-1], -1)
    parts = ([x] if include_input else []) + [jnp.sin(emb), jnp.cos(emb)]
    return jnp.concatenate(parts, axis=-1)


def posenc_dim(d: int, n_freqs: int, include_input: bool = True) -> int:
    return d * ((1 if include_input else 0) + 2 * n_freqs)
