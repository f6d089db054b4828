"""Dev-time parity harness: torch reference model vs this framework.

Run manually (requires the read-only reference checkout at /root/reference):

    python tools/parity_vs_reference.py

Validates, with converted weights on identical random inputs:
  * STFT complex outputs (expect <1e-5),
  * ConformerCSS masks with identical STFT input (expect <1e-6 — proves
    architecture + converter are exact),
  * iSTFT waveforms (expect <1e-5, including the reference quirk of
    synthesizing with sqrt_hann while analyzing with hann),
  * full-forward masks (expected to differ at isolated IPD branch-cut
    bins: raw phase-difference features flip by 2*pi when
    (cos-mean, sin-mean) lands within float eps of the negative real
    axis — the reference is equally sensitive to eps perturbations, as
    this script demonstrates by feeding our STFT into the torch net).

Not part of the test suite (tests must not depend on /root/reference).
"""
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from css.training.conformer_wrapper import (ConformerCfg, ConformerCssCfg,  # noqa: E402
                                            ConformerCssWrapper, ExtractorCfg,
                                            NnetCfg)

from notsofar_tpu.models.conformer import ConformerConfig  # noqa: E402
from notsofar_tpu.models.convert import convert_css_state_dict  # noqa: E402
from notsofar_tpu.models.css_wrapper import (ConformerCssConfig, CssModel,  # noqa: E402
                                             NnetConfig)
from notsofar_tpu.ops.features import ExtractorConfig  # noqa: E402


def main(attention_dim=64, heads=4, blocks=2, ffn=128):
    tcfg = ConformerCssCfg(
        extractor_conf=ExtractorCfg(),
        nnet_conf=NnetCfg(conformer_conf=ConformerCfg(
            attention_dim=attention_dim, attention_heads=heads,
            kernel_size=33, linear_units=ffn, num_blocks=blocks,
            dropout_rate=0.0), in_features=1799, num_spks=3, num_nois=1))
    torch.manual_seed(0)
    tm = ConformerCssWrapper(tcfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    jcfg = ConformerCssConfig(
        extractor_conf=ExtractorConfig(),
        nnet_conf=NnetConfig(conformer_conf=ConformerConfig(
            attention_dim=attention_dim, attention_heads=heads,
            kernel_size=33, linear_units=ffn, num_blocks=blocks,
            dropout_rate=0.0), in_features=1799, num_spks=3, num_nois=1))
    jm = CssModel(jcfg)
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_css_state_dict(sd, blocks))

    rng = np.random.RandomState(0)
    mix = (rng.randn(1, 16000, 7) * 0.1).astype(np.float32)

    t_stft = tm.stft(torch.from_numpy(mix))
    j_stft = jm.stft(jnp.asarray(mix))
    d_stft = np.abs(t_stft.numpy() - np.asarray(j_stft)).max()
    print(f"stft complex maxdiff:          {d_stft:.2e}")
    assert d_stft < 1e-4

    with torch.no_grad():
        t_masks = tm.separate(t_stft)["spk_masks"].numpy()
    j_masks = np.asarray(jm.separate(variables,
                                     jnp.asarray(t_stft.numpy()))["spk_masks"])
    d_net = np.abs(t_masks - j_masks).max()
    print(f"masks (identical stft input):  {d_net:.2e}")
    assert d_net < 1e-5, "architecture/converter mismatch!"

    c = t_stft[..., 0]
    tw = tm.istft(c).numpy()
    jw = np.asarray(jm.istft(jnp.asarray(c.numpy())))
    d_istft = np.abs(tw - jw).max()
    print(f"istft maxdiff:                 {d_istft:.2e}")
    assert d_istft < 1e-4

    with torch.no_grad():
        t_full = tm(torch.from_numpy(mix))["spk_masks"].numpy()
        t_cross = tm.separate(torch.from_numpy(
            np.array(j_stft)))["spk_masks"].numpy()
    j_full = np.asarray(jm.forward(variables, jnp.asarray(mix))["spk_masks"])
    d_full = np.abs(t_full - j_full).max()
    d_self = np.abs(t_full - t_cross).max()
    print(f"masks (own stft each):         {d_full:.2e}")
    print(f"torch net self-sensitivity:    {d_self:.2e}  (same order -> "
          "difference is input-sensitivity at IPD branch cuts, not model)")
    assert d_full < max(4 * d_self, 1e-5)
    print("PARITY OK")


if __name__ == "__main__":
    main()
