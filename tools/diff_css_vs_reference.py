"""Executed-reference differential: CssEngine vs the reference CSS path.

Runs the ACTUAL reference code — `/root/reference/css/css.py::separate_and_stitch`
(torch, CPU) — and this framework's `CssEngine.separate_and_stitch` on the
same audio with converted tiny-model weights, and diffs the separated wavs,
stitched masks, and activity gates.

Unlike tests/test_css_engine.py (which checks the engine against a
*reimplemented* host oracle), this harness executes the reference's own
segment loop / numpy MVDR / scipy-Hungarian stitch / morphology gating, so
any semantic drift in the rebuilt chain shows up as a wav diff here.

Modes and documented thresholds (all asserted):

    sc              1 ch, masked ch0 (css.py:226-231)
                    wav<1e-4  mask<1e-4  activity=exact-ish (>99.9%)
    mc_nomvdr_cos   7 ch, ref-channel mask, ipd_cos=True
                    wav<1e-4  mask<1e-4  act>99.9%
    mc_mvdr_cos     7 ch, MVDR (floor 0 dB => pure MVDR), ipd_cos=True
                    wav<2e-3  (float32 on-device Gauss-Jordan solve vs the
                    reference's float64 numpy.linalg.solve)  mask<1e-4
    mc_mvdr_raw     the SHIPPED raw-phase IPD config. The raw wrapped
                    phase-difference features are discontinuous (2*pi branch
                    cuts), so the full chain is chaotic at machine eps: the
                    tool measures the reference's own sensitivity to a
                    1-int16-LSB input perturbation and asserts our diff is
                    within 8x that self-sensitivity, with activity-gate
                    agreement > 99.5%. (Measured here: ref self-sensitivity
                    wav ~3e-2 / mask ~5e-2; ours lands at the same
                    saturation order — the divergence is input sensitivity,
                    not semantic drift. tools/parity_vs_reference.py proves
                    the same point at the single-forward level.)

The cos modes execute the reference's ExtractorCfg.ipd_cos=True branch
(feature.py:236-243) — same code path, continuous features — which makes a
tight end-to-end comparison possible.

Run manually (requires the read-only reference checkout at /root/reference):

    python tools/diff_css_vs_reference.py

Not part of the test suite (tests must not depend on /root/reference).
"""
import os
import sys
import types

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

# librosa isn't installed here; the reference only uses it on a legacy wav
# path (mvdr_util.py:23,45) that the pipeline call (mix_stft=..,
# return_stft=True) never reaches — stub the import so css.py loads.
sys.modules.setdefault("librosa", types.ModuleType("librosa"))
# soundfile likewise: only used by css/helpers.py load_audio, not by
# separate_and_stitch.
sys.modules.setdefault("soundfile", types.ModuleType("soundfile"))
# omegaconf: pulled in via css.helpers -> css.training.train -> utils.conf,
# but separate_and_stitch never touches config loading.
_oc = types.ModuleType("omegaconf")
_oc.OmegaConf = type("OmegaConf", (), {})
sys.modules.setdefault("omegaconf", _oc)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from css.css import CssCfg as RefCssCfg  # noqa: E402
from css.css import separate_and_stitch as ref_separate_and_stitch  # noqa: E402
from css.training.conformer_wrapper import (ConformerCfg, ConformerCssCfg,  # noqa: E402
                                            ConformerCssWrapper, ExtractorCfg,
                                            NnetCfg)

from notsofar_tpu.css.engine import CssCfg, CssEngine  # noqa: E402
from notsofar_tpu.models.conformer import ConformerConfig  # noqa: E402
from notsofar_tpu.models.convert import convert_css_state_dict  # noqa: E402
from notsofar_tpu.models.css_wrapper import (ConformerCssConfig, CssModel,  # noqa: E402
                                             NnetConfig)
from notsofar_tpu.ops.features import ExtractorConfig  # noqa: E402

FS = 16000
BLOCKS, DIM, HEADS, FFN = 2, 64, 4, 128


def build_pair(multichannel: bool, ipd_cos: bool = False):
    """Tiny torch reference model + converted JAX CssModel."""
    ipd = "1,0;2,0;3,0;4,0;5,0;6,0" if multichannel else ""
    in_features = 1799 if multichannel else 257
    tcfg = ConformerCssCfg(
        extractor_conf=ExtractorCfg(ipd_index=ipd, ipd_cos=ipd_cos),
        nnet_conf=NnetCfg(conformer_conf=ConformerCfg(
            attention_dim=DIM, attention_heads=HEADS, kernel_size=33,
            linear_units=FFN, num_blocks=BLOCKS, dropout_rate=0.0),
            in_features=in_features, num_spks=3, num_nois=1))
    torch.manual_seed(0 if multichannel else 1)
    tm = ConformerCssWrapper(tcfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    jcfg = ConformerCssConfig(
        extractor_conf=ExtractorConfig(ipd_index=ipd, ipd_cos=ipd_cos),
        nnet_conf=NnetConfig(conformer_conf=ConformerConfig(
            attention_dim=DIM, attention_heads=HEADS, kernel_size=33,
            linear_units=FFN, num_blocks=BLOCKS, dropout_rate=0.0),
            in_features=in_features, num_spks=3, num_nois=1))
    jm = CssModel(jcfg)
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x), convert_css_state_dict(sd, BLOCKS))
    return tm, jm, variables


def synth_audio(seconds: float, channels: int, seed: int) -> np.ndarray:
    """Structured synthetic meeting-ish audio, int16-quantized so both
    engines see bit-identical input (ours quantizes to int16 internally)."""
    rng = np.random.RandomState(seed)
    n = int(seconds * FS)
    t = np.arange(n) / FS
    x = np.zeros((n, channels), np.float32)
    # two 'speakers': AM tones with different carriers + babble noise
    for k, (f0, rate) in enumerate([(220.0, 1.3), (520.0, 2.1)]):
        env = (np.sin(2 * np.pi * rate * t + k) > 0.2).astype(np.float32)
        src = env * np.sin(2 * np.pi * f0 * t + rng.rand()) * 0.3
        for c in range(channels):
            delay = (c * 7 + k * 3) % 23
            x[delay:, c] += src[:n - delay]
    x += rng.randn(n, channels).astype(np.float32) * 0.02
    q = np.clip(np.rint(x * 8192.0), -32768, 32767)
    return (q / 32768.0).astype(np.float32)[None]  # [1, N, C]


def run_reference(tm, mix, mvdr: bool):
    rcfg = RefCssCfg(show_progressbar=False, mc_mvdr=mvdr)
    return ref_separate_and_stitch(mix.copy(), tm, FS,
                                   torch.device("cpu"), rcfg)


def run_ours(jm, variables, mix, mvdr: bool):
    jcfg = CssCfg(show_progressbar=False, mc_mvdr=mvdr,
                  compute_dtype="float32", seg_chunk=4)
    engine = CssEngine(jm, variables, jcfg)
    return engine.separate_and_stitch(mix.copy(), FS, return_side_info=True)


def diff(ref_out, j_out) -> dict:
    ref_wavs, ref_side = ref_out
    j_wavs, j_side = j_out
    n = min(len(ref_wavs[0]), len(j_wavs[0]))
    wav_diff = max(float(np.abs(r[:n] - j[:n]).max())
                   for r, j in zip(ref_wavs, j_wavs))
    ref_mask = ref_side["mask_stitched"][0].numpy()        # [F, T, S]
    j_mask = j_side["mask_stitched"]                       # [F, T, S]
    tmin = min(ref_mask.shape[1], j_mask.shape[1])
    mask_diff = float(np.abs(ref_mask[:, :tmin] - j_mask[:, :tmin]).max())
    ref_act = ref_side["activity_final"][0].numpy()        # [T, S] bool
    j_act = j_side["activity_final"][:tmin] > 0.5          # [T, S]
    act_agree = float((ref_act[:tmin] == j_act).mean())
    return {"wav": wav_diff, "mask": mask_diff, "act": act_agree}


def main():
    results = []

    # --- tight modes -------------------------------------------------------
    tm, jm, var = build_pair(multichannel=False)
    mix_sc = synth_audio(10.0, 1, seed=7)
    d = diff(run_reference(tm, mix_sc, mvdr=False),
             run_ours(jm, var, mix_sc, mvdr=False))
    results.append(("sc", d,
                    d["wav"] < 1e-4 and d["mask"] < 1e-4 and d["act"] > 0.999))

    tm, jm, var = build_pair(multichannel=True, ipd_cos=True)
    mix_mc = synth_audio(10.0, 7, seed=7)
    for name, mvdr, wav_th in [("mc_nomvdr_cos", False, 1e-4),
                               ("mc_mvdr_cos", True, 2e-3)]:
        d = diff(run_reference(tm, mix_mc, mvdr=mvdr),
                 run_ours(jm, var, mix_mc, mvdr=mvdr))
        results.append((name, d,
                        d["wav"] < wav_th and d["mask"] < 1e-4
                        and d["act"] > 0.999))

    # --- shipped raw-phase config: chaotic; calibrate vs self-sensitivity --
    tm, jm, var = build_pair(multichannel=True, ipd_cos=False)
    ref_out = run_reference(tm, mix_mc, mvdr=True)
    mix_lsb = mix_mc.copy()
    mix_lsb[0, ::997, :] += 1.0 / 32768.0
    ref_pert = run_reference(tm, mix_lsb, mvdr=True)
    sens_wav = max(float(np.abs(a - b).max())
                   for a, b in zip(ref_out[0], ref_pert[0]))
    d = diff(ref_out, run_ours(jm, var, mix_mc, mvdr=True))
    bound = 8.0 * max(sens_wav, 1e-3)
    results.append((f"mc_mvdr_raw (self-sens wav={sens_wav:.2e})", d,
                    d["wav"] < bound and d["act"] > 0.995))

    ok = True
    for name, d, passed in results:
        ok &= passed
        print(f"{name:45s} wav={d['wav']:.2e}  mask={d['mask']:.2e}  "
              f"act_agree={d['act']:.4f}  {'OK' if passed else 'FAIL'}")
    if not ok:
        sys.exit("DIFFERENTIAL FAILED")
    print("EXECUTED-REFERENCE DIFFERENTIAL OK "
          "(sc / mc_nomvdr / mc_mvdr wavs+masks+activity)")


if __name__ == "__main__":
    main()
