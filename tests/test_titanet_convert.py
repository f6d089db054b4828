"""Shape-driven NeMo TitaNet converter test with a synthetic NeMo-layout
state dict (numerical validation against a real checkpoint requires the
NGC weights — unavailable in this zero-egress environment)."""
import jax
import numpy as np
import pytest

from notsofar_tpu.models.titanet import SpeakerEncoder, TitaNetConfig
from notsofar_tpu.models.titanet_convert import convert_nemo_titanet

CFG = TitaNetConfig(filters=32, epilogue_filters=64, attention_dim=16,
                    emb_dim=8, block_kernels=(7, 11), block_repeat=2,
                    se_reduction=4)


def synth_nemo_state_dict(rng, cfg: TitaNetConfig, n_mels=80, n_classes=10,
                          affine_emb_bn=False):
    """Random state dict in the REAL NeMo EncDecSpeakerLabelModel layout.

    Layout facts this encodes (NeMo jasper.py / tdnn_attention.py /
    SpeakerDecoder): each JasperBlock repeat occupies 5 mconv slots
    (dw MaskedConv1d, pw MaskedConv1d, BatchNorm1d, activation, dropout;
    the last repeat has no act/dropout), squeeze-excite is APPENDED to
    mconv at index 5*(repeat-1)+3 with two bias-free linears under `.fc.`;
    the residual path is `res.0.0` (1x1 MaskedConv1d) + `res.0.1` (BN);
    the decoder's attentive pooling is a TDNNModule
    (`attention_layer.0.conv_layer` + `.0.bn`) + tanh + plain Conv1d
    (`attention_layer.2`); emb_layers.0 = Linear(bias) + BatchNorm1d where
    the BN is affine-FREE for angular-trained checkpoints (titanet_large);
    `decoder.final` is the bias-free classification head. Preprocessor
    buffers (featurizer.window/fb) ride along as in real checkpoints.
    All tensors random (incl. BN stats) so orientation/semantics bugs in
    the converter cannot hide behind identity values."""
    sd = {}

    def bn_keys(p, c, affine=True):
        if affine:
            sd[f"{p}.weight"] = 0.5 + rng.rand(c)
            sd[f"{p}.bias"] = rng.randn(c) * 0.1
        sd[f"{p}.running_mean"] = rng.randn(c) * 0.1
        sd[f"{p}.running_var"] = 0.5 + rng.rand(c)
        sd[f"{p}.num_batches_tracked"] = np.asarray(100)

    def block(idx, c_in, c_out, kernel, repeat, residual, se=True):
        p = f"encoder.encoder.{idx}"
        ci = c_in
        for r in range(repeat):
            o = 5 * r
            sd[f"{p}.mconv.{o}.conv.weight"] = rng.randn(ci, 1, kernel) * 0.1
            sd[f"{p}.mconv.{o+1}.conv.weight"] = rng.randn(c_out, ci, 1) * 0.1
            bn_keys(f"{p}.mconv.{o+2}", c_out)
            ci = c_out
        if se:
            si = 5 * (repeat - 1) + 3
            sd[f"{p}.mconv.{si}.fc.0.weight"] = \
                rng.randn(c_out // cfg.se_reduction, c_out) * 0.1
            sd[f"{p}.mconv.{si}.fc.2.weight"] = \
                rng.randn(c_out, c_out // cfg.se_reduction) * 0.1
        if residual:
            sd[f"{p}.res.0.0.conv.weight"] = rng.randn(c_out, c_in, 1) * 0.1
            bn_keys(f"{p}.res.0.1", c_out)

    block(0, n_mels, cfg.filters, cfg.prologue_kernel, 1, residual=False,
          se=cfg.prologue_se)
    c = cfg.filters
    for bi, k in enumerate(cfg.block_kernels):
        block(1 + bi, c, cfg.filters, k, cfg.block_repeat, residual=True)
    block(1 + len(cfg.block_kernels), cfg.filters, cfg.epilogue_filters, 1,
          1, residual=False, se=cfg.epilogue_se)

    C = cfg.epilogue_filters
    sd["decoder._pooling.attention_layer.0.conv_layer.weight"] = \
        rng.randn(cfg.attention_dim, 3 * C, 1) * 0.1
    sd["decoder._pooling.attention_layer.0.conv_layer.bias"] = \
        rng.randn(cfg.attention_dim) * 0.1
    bn_keys("decoder._pooling.attention_layer.0.bn", cfg.attention_dim)
    sd["decoder._pooling.attention_layer.2.weight"] = \
        rng.randn(C, cfg.attention_dim, 1) * 0.1
    sd["decoder._pooling.attention_layer.2.bias"] = rng.randn(C) * 0.1
    sd["decoder.emb_layers.0.0.weight"] = rng.randn(cfg.emb_dim, 2 * C) * 0.1
    sd["decoder.emb_layers.0.0.bias"] = rng.randn(cfg.emb_dim) * 0.1
    bn_keys("decoder.emb_layers.0.1", cfg.emb_dim, affine=affine_emb_bn)
    sd["decoder.final.weight"] = rng.randn(n_classes, cfg.emb_dim) * 0.1
    sd["preprocessor.featurizer.window"] = np.hanning(400)
    sd["preprocessor.featurizer.fb"] = rng.rand(1, 257, n_mels)
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_converter_structure_and_forward():
    rng = np.random.RandomState(0)
    sd = synth_nemo_state_dict(rng, CFG)
    variables = convert_nemo_titanet(sd, CFG)

    ref = SpeakerEncoder(CFG)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape,
                                        ref.variables["params"])
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape,
                                        variables["params"])
    # converted params must agree everywhere they exist
    for key in ["prologue", "block_0", "block_1", "epilogue",
                "pool", "emb"]:
        assert key in got_shapes, key
        assert got_shapes[key] == ref_shapes[key], (
            key, got_shapes[key], ref_shapes[key])

    enc = SpeakerEncoder(CFG, variables=variables)
    wavs = rng.randn(2, 4000).astype(np.float32) * 0.1
    emb = enc.embed(wavs, np.array([4000, 2000], np.int32))
    assert emb.shape == (2, CFG.emb_dim)
    assert np.isfinite(emb).all()


def test_converter_rejects_garbage():
    with pytest.raises(ValueError):
        convert_nemo_titanet({"foo.bar": np.zeros(3)})


def test_torch_oracle_parity():
    """Converted-JAX vs independent torch NeMo-semantics forward: <1e-4.

    The numeric oracle VERDICT r2 asked for — validates depthwise kernel
    orientation, SE padded-width denominator, masked conv semantics, BN
    epsilons, ECAPA pooling statistics, and the affine-free emb BN of
    angular-trained checkpoints, on a small random NeMo-layout state
    dict."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.torch_titanet_oracle import run_parity
    err = run_parity(CFG, seed=1, verbose=False)
    assert err < 1e-4, err


def test_torch_oracle_parity_affine_bn():
    """Same contract for a non-angular checkpoint (emb BN has affine)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.torch_titanet_oracle import torch_forward
    import jax.numpy as jnp
    from notsofar_tpu.models.titanet import titanet_features

    rng = np.random.RandomState(2)
    sd = synth_nemo_state_dict(rng, CFG, affine_emb_bn=True)
    enc = SpeakerEncoder(CFG, variables=convert_nemo_titanet(sd, CFG))
    wavs = (rng.randn(2, 6000) * 0.1).astype(np.float32)
    wavs[1, 2500:] = 0.0
    lengths = np.array([6000, 2500], np.int32)
    feats = np.asarray(titanet_features(jnp.asarray(wavs),
                                        lengths=jnp.asarray(lengths)))
    want = torch_forward(sd, CFG, feats, lengths // 160 + 1)
    got = enc.embed(wavs, lengths)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 1e-4, err
