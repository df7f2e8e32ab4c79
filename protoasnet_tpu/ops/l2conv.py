"""Patch-to-prototype L2 distances (classic ProtoPNet prototype layer).

Reference semantics (_l2_convolution, ProtoPNet.py:189-207):
  dist[n, h, w, p] = relu( sum_patch x^2  - 2 <x_patch, proto_p> + ||proto_p||^2 )
computed with the conv trick. For 1x1 prototypes (the only shape the
reference configs use) this reduces to a single (N*H*W, D) @ (D, P) matmul
— pure MXU work. General kernel sizes fall back to
``lax.conv_general_dilated`` in NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["l2_patch_distances"]


def l2_patch_distances(x: jnp.ndarray, prototypes: jnp.ndarray) -> jnp.ndarray:
    """x: (N, H, W, D) conv features; prototypes: (P, kh, kw, D) (channels
    last). Returns (N, H', W', P) squared L2 distances per patch."""
    p, kh, kw, d = prototypes.shape
    # at-least-float32 (parity-critical head math; bf16 inputs accumulate
    # in fp32 on the MXU) — but never DOWNcast: float64 trajectory-parity
    # runs must stay float64 end to end
    dt = jnp.promote_types(x.dtype, jnp.float32)
    if (kh, kw) == (1, 1):
        w = prototypes.reshape(p, d).astype(dt)  # (P, D)
        x = x.astype(dt)
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (N, H, W, 1)
        p2 = jnp.sum(w * w, axis=-1)  # (P,)
        xp = jnp.einsum("nhwd,pd->nhwp", x, w,
                        preferred_element_type=dt,
                        precision=jax.lax.Precision.HIGHEST)
        return jax.nn.relu(x2 - 2.0 * xp + p2[None, None, None, :])

    # general case: conv with prototype filters, HWIO kernel layout
    kernel = jnp.transpose(prototypes, (1, 2, 3, 0)).astype(dt)  # (kh,kw,D,P)
    ones = jnp.ones_like(kernel)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = x.astype(dt)
    x2_patch = jax.lax.conv_general_dilated(x * x, ones, (1, 1), "VALID",
                                            dimension_numbers=dn)
    xp = jax.lax.conv_general_dilated(x, kernel, (1, 1), "VALID",
                                      dimension_numbers=dn)
    p2 = jnp.sum(prototypes.reshape(p, -1) ** 2, axis=-1)
    return jax.nn.relu(x2_patch - 2.0 * xp + p2[None, None, None, :])
