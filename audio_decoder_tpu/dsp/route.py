"""Channel routing: mixdown / fan-out as one batched matmul.

The reference's only channel conversion is a mono→stereo fan-out hack in
the voice loop (engine.rs:419-427).  Here any C_in → C_out conversion is
a routing matrix applied as ``einsum('bsc,cm->bsm')`` — XLA maps it onto
the MXU and fuses it with neighboring elementwise work.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def routing_matrix(c_in: int, c_out: int) -> np.ndarray:
    """Default conversion matrix [c_in, c_out]:

    * c_in == c_out: identity;
    * mono → N: fan-out (copy to every output, engine.rs:419-427);
    * N → mono: equal-weight downmix (1/N each);
    * stereo → N>2: L/R to the first two, silence above;
    * N → M otherwise: identity on the overlap, extra inputs folded into
      the last output at equal weight.
    """
    m = np.zeros((c_in, c_out))
    if c_in == c_out:
        np.fill_diagonal(m, 1.0)
    elif c_in == 1:
        m[0, :] = 1.0
    elif c_out == 1:
        m[:, 0] = 1.0 / c_in
    else:
        k = min(c_in, c_out)
        for i in range(k):
            m[i, i] = 1.0
        if c_in > c_out:
            extra = c_in - k
            m[k:, c_out - 1] = 1.0 / (extra + 1)
            m[c_out - 1, c_out - 1] = 1.0 / (extra + 1)
    return m


def route_channels(
    pcm: jax.Array, out_channels: int, matrix: np.ndarray | None = None
) -> jax.Array:
    """pcm [B, S, C_in] → [B, S, out_channels] through a routing matrix
    (default: routing_matrix), clipped to [-1, 1] like the mix path."""
    c_in = pcm.shape[-1]
    m = routing_matrix(c_in, out_channels) if matrix is None else matrix
    out = jnp.einsum(
        "bsc,cm->bsm", pcm, jnp.asarray(m, pcm.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.clip(out, -1.0, 1.0)
