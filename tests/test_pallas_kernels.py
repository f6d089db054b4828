"""Pallas kernel tests (interpret mode on the CPU mesh; the same kernels
compile natively on TPU — benchmarked at parity with the XLA einsum)."""
import jax
import jax.numpy as jnp
import numpy as np

from notsofar_tpu.ops.mvdr import make_wta, masked_scm
from notsofar_tpu.ops.pallas_kernels import masked_scm_pallas


def test_masked_scm_pallas_matches_einsum():
    rng = np.random.RandomState(0)
    B, F, T, M, S = 2, 257, 186, 7, 3
    spk = jnp.asarray(rng.rand(B, F, T, S).astype(np.float32))
    noi = jnp.asarray(rng.rand(B, F, T, 1).astype(np.float32))
    x = jax.lax.complex(
        jnp.asarray(rng.randn(B, F, T, M).astype(np.float32)),
        jnp.asarray(rng.randn(B, F, T, M).astype(np.float32)))
    wta = make_wta(spk, noi)
    want = np.asarray(masked_scm(wta, x))
    got = np.asarray(masked_scm_pallas(wta, x, interpret=True))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-5
    # hermitian + regularized diagonal preserved
    np.testing.assert_allclose(got, got.conj().swapaxes(-1, -2),
                               rtol=1e-5, atol=1e-5)


def test_masked_scm_pallas_small_shapes():
    rng = np.random.RandomState(1)
    B, F, T, M, S = 1, 9, 40, 7, 3  # F not a multiple of the block
    spk = jnp.asarray(rng.rand(B, F, T, S).astype(np.float32))
    noi = jnp.asarray(rng.rand(B, F, T, 1).astype(np.float32))
    x = jax.lax.complex(
        jnp.asarray(rng.randn(B, F, T, M).astype(np.float32)),
        jnp.asarray(rng.randn(B, F, T, M).astype(np.float32)))
    wta = make_wta(spk, noi)
    want = np.asarray(masked_scm(wta, x))
    got = np.asarray(masked_scm_pallas(wta, x, f_block=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
