"""Checkpoint converter structural tests (torch-layout state dict -> flax).

Full numerical parity against the actual torch reference is validated by
tools/parity_vs_reference.py (masks match to <1e-6 with identical inputs);
these tests keep the suite standalone by synthesizing the reference key
layout with numpy.
"""
import jax
import jax.numpy as jnp
import numpy as np

from notsofar_tpu.models.conformer import ConformerConfig
from notsofar_tpu.models.convert import convert_css_state_dict
from notsofar_tpu.models.css_wrapper import (ConformerCssConfig, CssModel,
                                             NnetConfig)

CFG = ConformerConfig(attention_dim=32, attention_heads=4, linear_units=64,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0)


def synth_state_dict(rng, d=32, idim=1799, ffn=64, blocks=2, k=5, nbins=257,
                     nsrc=4):
    """Reference ConformerCssWrapper state-dict layout with random values."""
    sd = {}
    P = "executor.nnet."
    sd[P + "input_bias"] = np.zeros((1, 1, idim), np.float32)
    sd[P + "input_scale"] = np.ones((1, 1, idim), np.float32)
    sd[P + "conformer.embed.0.weight"] = rng.randn(d, idim).astype(np.float32) * 0.02
    sd[P + "conformer.embed.0.bias"] = rng.randn(d).astype(np.float32) * 0.02
    sd[P + "conformer.embed.1.weight"] = np.ones(d, np.float32)
    sd[P + "conformer.embed.1.bias"] = np.zeros(d, np.float32)
    sd[P + "conformer.pos_emb.pe_k.weight"] = rng.randn(2000, d // 4).astype(np.float32) * 0.02
    for i in range(blocks):
        L = P + f"conformer.encoders.{i}."
        for name in ["feed_forward_in", "feed_forward_out"]:
            sd[L + f"{name}.layer_norm.weight"] = np.ones(d, np.float32)
            sd[L + f"{name}.layer_norm.bias"] = np.zeros(d, np.float32)
            sd[L + f"{name}.net.0.weight"] = rng.randn(ffn, d).astype(np.float32) * 0.02
            sd[L + f"{name}.net.0.bias"] = np.zeros(ffn, np.float32)
            sd[L + f"{name}.net.3.weight"] = rng.randn(d, ffn).astype(np.float32) * 0.02
            sd[L + f"{name}.net.3.bias"] = np.zeros(d, np.float32)
        sd[L + "self_attn.layer_norm.weight"] = np.ones(d, np.float32)
        sd[L + "self_attn.layer_norm.bias"] = np.zeros(d, np.float32)
        for lin in ["linear_q", "linear_k", "linear_v", "linear_out"]:
            sd[L + f"self_attn.{lin}.weight"] = rng.randn(d, d).astype(np.float32) * 0.02
            sd[L + f"self_attn.{lin}.bias"] = np.zeros(d, np.float32)
        sd[L + "conv.layer_norm.weight"] = np.ones(d, np.float32)
        sd[L + "conv.layer_norm.bias"] = np.zeros(d, np.float32)
        sd[L + "conv.pw_conv_1.weight"] = rng.randn(2, 1, 1, 1).astype(np.float32)
        sd[L + "conv.pw_conv_1.bias"] = np.zeros(2, np.float32)
        sd[L + "conv.dw_conv_1d.weight"] = rng.randn(d, 1, k).astype(np.float32) * 0.1
        sd[L + "conv.dw_conv_1d.bias"] = np.zeros(d, np.float32)
        sd[L + "conv.BN.weight"] = np.ones(d, np.float32)
        sd[L + "conv.BN.bias"] = np.zeros(d, np.float32)
        sd[L + "conv.BN.running_mean"] = np.zeros(d, np.float32)
        sd[L + "conv.BN.running_var"] = np.ones(d, np.float32)
        sd[L + "conv.pw_conv_2.weight"] = rng.randn(1, 1, 1, 1).astype(np.float32)
        sd[L + "conv.pw_conv_2.bias"] = np.zeros(1, np.float32)
        sd[L + "layer_norm.weight"] = np.ones(d, np.float32)
        sd[L + "layer_norm.bias"] = np.zeros(d, np.float32)
    sd[P + "linear.weight"] = rng.randn(nbins * nsrc, d).astype(np.float32) * 0.02
    sd[P + "linear.bias"] = np.zeros(nbins * nsrc, np.float32)
    return sd


def test_converted_variables_match_init_structure():
    rng = np.random.RandomState(0)
    sd = synth_state_dict(rng)
    converted = convert_css_state_dict(sd, num_blocks=2)

    model = CssModel(ConformerCssConfig(nnet_conf=NnetConfig(conformer_conf=CFG)))
    init_vars = model.init(jax.random.PRNGKey(0))

    init_shapes = jax.tree_util.tree_map(lambda x: x.shape, init_vars)
    conv_shapes = jax.tree_util.tree_map(lambda x: x.shape, converted)
    assert jax.tree_util.tree_structure(init_shapes) == \
        jax.tree_util.tree_structure(conv_shapes)
    assert init_shapes == conv_shapes


def test_converted_model_runs():
    rng = np.random.RandomState(1)
    converted = jax.tree_util.tree_map(
        jnp.asarray, convert_css_state_dict(synth_state_dict(rng), 2))
    model = CssModel(ConformerCssConfig(nnet_conf=NnetConfig(conformer_conf=CFG)))
    mix = jnp.asarray(rng.randn(1, 16000, 7).astype(np.float32) * 0.1)
    res = model.forward(converted, mix)
    m = np.asarray(res["spk_masks"])
    assert np.isfinite(m).all() and (m >= 0).all() and (m <= 1).all()
