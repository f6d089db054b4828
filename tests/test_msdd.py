"""MSDD module tests: shape/range contract, data-driven speaker count,
and per-batch independence. (Behavioral validation needs the real
diar_msdd_telephonic weights — unavailable in this zero-egress
environment; random weights exercise plumbing only.)"""
import numpy as np

from notsofar_tpu.models.msdd import MSDDConfig, OverlapDecoder

CFG = MSDDConfig(emb_dim=16, n_scales=3, num_spks=2, hidden=8,
                 num_lstm_layers=2, cnn_channels=4)


def test_shapes_and_range():
    dec = OverlapDecoder(CFG)
    rng = np.random.RandomState(0)
    e = rng.randn(2, 7, CFG.n_scales, CFG.emb_dim).astype(np.float32)
    a = rng.randn(2, CFG.n_scales, CFG.emb_dim, CFG.num_spks).astype(
        np.float32)
    p = dec.refine(e, a)
    assert p.shape == (2, 7, CFG.num_spks)
    assert (p >= 0).all() and (p <= 1).all()


def test_variable_speaker_count():
    """S is data-driven (NeMo scores pairs; the module takes any S)."""
    dec = OverlapDecoder(CFG)
    rng = np.random.RandomState(1)
    e = rng.randn(1, 5, CFG.n_scales, CFG.emb_dim).astype(np.float32)
    a3 = rng.randn(1, CFG.n_scales, CFG.emb_dim, 3).astype(np.float32)
    # out layer is sized by S at first call; use a fresh decoder per S
    from notsofar_tpu.models.msdd import MSDD
    import jax
    import jax.numpy as jnp
    m = MSDD(CFG)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(e), jnp.asarray(a3))
    p = np.asarray(m.apply(v, jnp.asarray(e), jnp.asarray(a3)))
    assert p.shape == (1, 5, 3)


def test_batch_consistency():
    """Each batch element is processed independently."""
    dec = OverlapDecoder(CFG)
    rng = np.random.RandomState(2)
    e = rng.randn(3, 6, CFG.n_scales, CFG.emb_dim).astype(np.float32)
    a = rng.randn(3, CFG.n_scales, CFG.emb_dim, 2).astype(np.float32)
    full = dec.refine(e, a)
    solo = dec.refine(e[1:2], a[1:2])
    np.testing.assert_allclose(full[1:2], solo, atol=1e-5)
