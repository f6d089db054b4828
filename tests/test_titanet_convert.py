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


def synth_nemo_state_dict(rng, cfg: TitaNetConfig, n_mels=80):
    sd = {}

    def block(idx, c_in, c_out, kernel, repeat, residual):
        p = f"encoder.encoder.{idx}"
        ci = c_in
        for r in range(repeat):
            sd[f"{p}.mconv.{3*r}.conv.weight"] = rng.randn(ci, 1, kernel) * 0.1
            sd[f"{p}.mconv.{3*r+1}.conv.weight"] = rng.randn(c_out, ci, 1) * 0.1
            sd[f"{p}.mconv.{3*r+2}.weight"] = np.ones(c_out)
            sd[f"{p}.mconv.{3*r+2}.bias"] = np.zeros(c_out)
            sd[f"{p}.mconv.{3*r+2}.running_mean"] = np.zeros(c_out)
            sd[f"{p}.mconv.{3*r+2}.running_var"] = np.ones(c_out)
            ci = c_out
        sd[f"{p}.mout.0.fc.0.weight"] = rng.randn(c_out // cfg.se_reduction,
                                                  c_out) * 0.1
        sd[f"{p}.mout.0.fc.0.bias"] = np.zeros(c_out // cfg.se_reduction)
        sd[f"{p}.mout.0.fc.2.weight"] = rng.randn(c_out,
                                                  c_out // cfg.se_reduction) * 0.1
        sd[f"{p}.mout.0.fc.2.bias"] = np.zeros(c_out)
        if residual:
            sd[f"{p}.res.0.0.conv.weight"] = rng.randn(c_out, c_in, 1) * 0.1
            sd[f"{p}.res.0.1.weight"] = np.ones(c_out)
            sd[f"{p}.res.0.1.bias"] = np.zeros(c_out)
            sd[f"{p}.res.0.1.running_mean"] = np.zeros(c_out)
            sd[f"{p}.res.0.1.running_var"] = np.ones(c_out)

    block(0, n_mels, cfg.filters, cfg.prologue_kernel, 1, residual=False)
    c = cfg.filters
    for bi, k in enumerate(cfg.block_kernels):
        block(1 + bi, c, cfg.filters, k, cfg.block_repeat, residual=True)
    block(1 + len(cfg.block_kernels), cfg.filters, cfg.epilogue_filters, 1,
          1, residual=False)

    sd["decoder._pooling.attention_layer.0.conv.weight"] = \
        rng.randn(cfg.attention_dim, cfg.epilogue_filters, 1) * 0.1
    sd["decoder._pooling.attention_layer.0.conv.bias"] = \
        np.zeros(cfg.attention_dim)
    sd["decoder._pooling.attention_layer.2.conv.weight"] = \
        rng.randn(cfg.epilogue_filters, cfg.attention_dim, 1) * 0.1
    sd["decoder._pooling.attention_layer.2.conv.bias"] = \
        np.zeros(cfg.epilogue_filters)
    sd["decoder.emb_layers.0.0.weight"] = rng.randn(
        cfg.emb_dim, cfg.epilogue_filters * 2) * 0.1
    sd["decoder.emb_layers.0.1.weight"] = np.ones(cfg.emb_dim)
    sd["decoder.emb_layers.0.1.bias"] = np.zeros(cfg.emb_dim)
    sd["decoder.emb_layers.0.1.running_mean"] = np.zeros(cfg.emb_dim)
    sd["decoder.emb_layers.0.1.running_var"] = np.ones(cfg.emb_dim)
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
    # converted params must agree everywhere they exist; stats_bn from the
    # synthetic dict lands on emb-bn slot or identity — compare keys present
    for key in ["prologue", "block_0", "block_1", "epilogue", "epilogue_bn",
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
