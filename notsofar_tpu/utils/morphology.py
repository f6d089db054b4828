"""1-D binary morphology (erode/dilate).

Rebuild of /root/reference/utils/numpy_utils.py:4-13 with both a NumPy host
version and a jit-friendly JAX version built on lax.reduce_window (max/min
pooling) for use inside the on-device CSS activity gating.
"""
import numpy as np
import jax
import jax.numpy as jnp


def erode_np(arr: np.ndarray, iters: int) -> np.ndarray:
    assert arr.ndim == 1
    if iters <= 0:
        return arr.copy()
    p = np.pad(arr, iters, mode="constant", constant_values=1)
    return np.lib.stride_tricks.sliding_window_view(p, 2 * iters + 1).min(1)


def dilate_np(arr: np.ndarray, iters: int) -> np.ndarray:
    assert arr.ndim == 1
    if iters <= 0:
        return arr.copy()
    p = np.pad(arr, iters, mode="constant", constant_values=0)
    return np.lib.stride_tricks.sliding_window_view(p, 2 * iters + 1).max(1)


def dilate_jax(x: jnp.ndarray, iters: int, axis: int = 0) -> jnp.ndarray:
    """Binary dilation along `axis` of a boolean/0-1 array (any rank)."""
    if iters <= 0:
        return x
    window = [1] * x.ndim
    window[axis] = 2 * iters + 1
    pad = [(0, 0)] * x.ndim
    pad[axis] = (iters, iters)
    xf = x.astype(jnp.float32)
    out = jax.lax.reduce_window(xf, -jnp.inf, jax.lax.max, tuple(window),
                                (1,) * x.ndim, pad)
    # Padding contributed -inf (treated as 0 / False outside the signal).
    return out > 0.5


def erode_jax(x: jnp.ndarray, iters: int, axis: int = 0) -> jnp.ndarray:
    """Binary erosion along `axis`; outside-signal values count as True."""
    if iters <= 0:
        return x
    window = [1] * x.ndim
    window[axis] = 2 * iters + 1
    pad = [(0, 0)] * x.ndim
    pad[axis] = (iters, iters)
    xf = x.astype(jnp.float32)
    out = jax.lax.reduce_window(xf, jnp.inf, jax.lax.min, tuple(window),
                                (1,) * x.ndim, pad)
    return out > 0.5
