"""Permutation-invariant loss, jit-native.

TPU-native rebuild of PitWrapper (/root/reference/css/training/losses.py:11-97).
The reference runs scipy's Hungarian solver on the host per sample; with
NOTSOFAR's 3 sources there are only 3! = 6 permutations, so we brute-force
the argmin entirely inside jit — no host callback, fully batched.

Contracts match the reference:
    preds/targets: [B, ..., S] (sources last).
    returns (loss [B], perm [B, S]) where loss is the per-sample mean of the
    optimally-assigned pairwise losses, and targets[..., perm[b]] aligns with
    preds[b].
"""
import itertools
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise squared error (no reduction), parity with losses.py:100-102."""
    return (pred - target) ** 2


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise absolute error (no reduction), parity with losses.py:104-106."""
    return jnp.abs(pred - target)


BASE_LOSSES = {"mse": mse_loss, "l1": l1_loss}


def _permutations(n: int) -> np.ndarray:
    return np.array(list(itertools.permutations(range(n))), dtype=np.int32)


def pairwise_loss_matrix(preds: jnp.ndarray, targets: jnp.ndarray,
                         base_loss: Callable) -> jnp.ndarray:
    """[B, ..., S] x [B, ..., S] -> loss matrix [B, S, S].

    loss_mat[b, i, j] = mean over all non-source dims of
    base_loss(preds[..., i], targets[..., j]).
    """
    # [B, ..., S, 1] vs [B, ..., 1, S]
    lm = base_loss(preds[..., :, None], targets[..., None, :])
    axes = tuple(range(1, lm.ndim - 2))
    return lm.mean(axis=axes) if axes else lm


@partial(jax.jit, static_argnames=("base",))
def pit_loss(preds: jnp.ndarray, targets: jnp.ndarray, base: str = "mse"
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched permutation-invariant loss.

    Returns:
        loss: [B] — minimum over permutations of mean assigned loss.
        perm: [B, S] int32 — optimal permutation of *targets*:
              targets[..., perm[b]] aligns with preds[b].
    """
    base_loss = BASE_LOSSES[base]
    lm = pairwise_loss_matrix(preds, targets, base_loss)  # [B, S, S]
    S = lm.shape[-1]
    perms = _permutations(S)  # [P, S] (np: constant-folded host-side)
    # total[b, p] = mean_s lm[b, s, perms[p, s]]
    gathered = jnp.take_along_axis(
        lm[:, None, :, :].repeat(perms.shape[0], axis=1),  # [B, P, S, S]
        perms[None, :, :, None], axis=3)[..., 0]           # [B, P, S]
    totals = gathered.mean(axis=-1)  # [B, P]
    best = jnp.argmin(totals, axis=-1)  # [B]
    loss = jnp.take_along_axis(totals, best[:, None], axis=1)[:, 0]
    perm = jnp.asarray(perms)[best]  # [B, S]
    return loss, perm


def permute_sources(x: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Apply a per-sample source permutation: out[b, ..., s] = x[b, ..., perm[b, s]].

    x: [B, ..., S]; perm: [B, S].
    """
    B, S = perm.shape
    pb = perm.reshape(B, *([1] * (x.ndim - 2)), S)
    pb = jnp.broadcast_to(pb, x.shape)
    return jnp.take_along_axis(x, pb, axis=-1)
