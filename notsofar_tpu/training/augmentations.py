"""Training-time augmentations.

Mic-shift: random cyclic rotation of the 6 circular microphones (mic 0
fixed), applied consistently to the mixture and every GT column. Rebuild of
/root/reference/css/training/augmentations.py:5-87 — but instead of a
host-side gather, the rotation runs inside the jitted train step as a
take_along_axis with a traced per-sample shift (drawn from the train-step
PRNG key), so it fuses with the rest of the step.
"""
from typing import Dict

import jax
import jax.numpy as jnp

MIC_ARRAY_KEYS = ("mixture", "gt_spk_direct_early_echoes", "gt_spk_reverb",
                  "gt_noise")


def batch_roll_mics(arr: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """Roll dim 2 (mics) per batch element: out[b,t,m] = arr[b,t,(m - s_b) % M].

    arr: [B, T, M] or [B, T, M, S]; shifts: [B] int.
    """
    squeeze = arr.ndim == 3
    if squeeze:
        arr = arr[..., None]
    B, T, M, S = arr.shape
    idx = (jnp.arange(M)[None, :] - shifts[:, None]) % M       # [B, M]
    idx = idx[:, None, :, None]
    idx = jnp.broadcast_to(idx, (B, T, M, S))
    out = jnp.take_along_axis(arr, idx, axis=2)
    return out[..., 0] if squeeze else out


def mic_shift_augment(batch: Dict[str, jnp.ndarray], rng: jax.Array
                      ) -> Dict[str, jnp.ndarray]:
    """Apply one random rotation (0..5) of mics 1..6 per sample."""
    ref = batch["mixture"]
    assert ref.shape[2] == 7, "expecting 7 microphones at dim 2"
    shifts = jax.random.randint(rng, (ref.shape[0],), 0, 6)
    out = dict(batch)
    for key in MIC_ARRAY_KEYS:
        if key in out:
            arr = out[key]
            rolled = batch_roll_mics(arr[:, :, 1:], shifts)
            out[key] = jnp.concatenate([arr[:, :, :1], rolled], axis=2)
    return out
