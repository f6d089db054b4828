"""Conformer CSS model structural tests: shapes, mask range, determinism,
and the full 4-method wrapper interface contract
(conformer_wrapper.py:58-146)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from notsofar_tpu.models.conformer import ConformerConfig, ConformerCSS
from notsofar_tpu.models.css_wrapper import (ConformerCssConfig, CssModel,
                                             NnetConfig, sc_css_config)

TINY = ConformerConfig(attention_dim=32, attention_heads=4, linear_units=64,
                       num_blocks=2, kernel_size=5, dropout_rate=0.1)


@pytest.fixture(scope="module")
def tiny_mc_model():
    cfg = ConformerCssConfig(nnet_conf=NnetConfig(conformer_conf=TINY))
    model = CssModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), example_T=23)
    return model, variables


def test_mask_head_shapes_and_range(tiny_mc_model):
    model, variables = tiny_mc_model
    f = jnp.asarray(np.random.RandomState(0).randn(2, 1799, 23), jnp.float32)
    masks = model.masks_from_feature(variables, f)
    assert masks.shape == (2, 257, 23, 4)
    m = np.asarray(masks)
    assert (m >= 0).all() and (m <= 1).all()


def test_forward_mc_interface(tiny_mc_model):
    model, variables = tiny_mc_model
    mix = jnp.asarray(np.random.RandomState(1).randn(1, 16000, 7) * 0.1,
                      jnp.float32)
    res = model.forward(variables, mix)
    T = model.extractor.stft.num_bins  # 257
    assert res["spk_masks"].shape[:2] == (1, 257)
    assert res["spk_masks"].shape[-1] == 3
    assert res["noise_masks"].shape[-1] == 1


def test_stft_istft_wrapper_contract(tiny_mc_model):
    model, _ = tiny_mc_model
    rng = np.random.RandomState(2)
    s = jnp.asarray(rng.randn(1, 8192, 7) * 0.1, jnp.float32)
    c = model.stft(s)
    assert c.ndim == 4 and c.shape[0] == 1 and c.shape[1] == 257
    assert c.shape[3] == 7
    y = model.istft(c[..., 0])
    assert y.ndim == 2 and y.shape[0] == 1


def test_sc_model_forward():
    cfg = sc_css_config(TINY)
    model = CssModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), example_T=23)
    mix = jnp.asarray(np.random.RandomState(3).randn(1, 16000, 1) * 0.1,
                      jnp.float32)
    res = model.forward(variables, mix)
    assert res["spk_masks"].shape[-1] == 3


def test_deterministic_eval(tiny_mc_model):
    model, variables = tiny_mc_model
    f = jnp.asarray(np.random.RandomState(4).randn(1, 1799, 23), jnp.float32)
    m1 = np.asarray(model.masks_from_feature(variables, f))
    m2 = np.asarray(model.masks_from_feature(variables, f))
    np.testing.assert_array_equal(m1, m2)


def test_dropout_and_batchstats_in_train_mode(tiny_mc_model):
    model, variables = tiny_mc_model
    f = jnp.asarray(np.random.RandomState(5).randn(2, 1799, 23), jnp.float32)
    out, new_vars = model.module.apply(
        variables, f, deterministic=False, use_running_average=False,
        rngs={"dropout": jax.random.PRNGKey(7)}, mutable=["batch_stats"])
    assert out.shape == (2, 257, 23, 4)
    assert "batch_stats" in new_vars


def test_gradients_flow(tiny_mc_model):
    model, variables = tiny_mc_model
    f = jnp.asarray(np.random.RandomState(6).randn(1, 1799, 23), jnp.float32)

    def loss_fn(params):
        v = dict(variables, params=params)
        m = model.masks_from_feature(v, f)
        return jnp.mean(m ** 2)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
