"""MarbleNet frame-level voice activity detection in flax.

The reference's time-based diarization recipe runs NeMo's
`vad_multilingual_marblenet` model (diarization config
`vad_model_name`, time_based_diarization.py:20-117; NeMo is not
available in this environment). MarbleNet is a small QuartzNet-style
stack of time-channel-separable 1D convolutions over log-mel features
(MarbleNet paper; NeMo vad_*_marblenet.yaml):

  prologue  128ch k=11 x1          separable, no residual
  3 blocks   64ch k=13/15/17 x2    separable, residual
  epilogue  128ch k=29 dil=2 x1    separable, no residual
  epilogue  128ch k=1  x1          plain conv, no residual
  decoder   linear -> 2 classes (speech / non-speech)

TPU-first deviation: NeMo's segment-VAD recipe slides a 0.63 s window
over the audio and classifies each window separately (one forward per
10 ms hop). Here the classifier linear is applied PER FRAME on the
encoder output of the whole waveform — one dispatch per stream at the
same 10 ms resolution, with every conv a dense MXU-friendly matmul.

All convs are stride 1 on a 10 ms-hop mel frontend, so the output frame
rate equals the diarizer's VAD_TIME_RESOLUTION directly.

Converted checkpoints are shape-validated only (real weights need
egress); the energy VAD remains the fallback when no model is mounted.
"""
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from notsofar_tpu.models.titanet import titanet_features
from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("marblenet")


class BlockSpec(NamedTuple):
    filters: int
    repeat: int
    kernel: int
    dilation: int
    residual: bool
    separable: bool


DEFAULT_BLOCKS: Tuple[BlockSpec, ...] = (
    BlockSpec(128, 1, 11, 1, False, True),
    BlockSpec(64, 2, 13, 1, True, True),
    BlockSpec(64, 2, 15, 1, True, True),
    BlockSpec(64, 2, 17, 1, True, True),
    BlockSpec(128, 1, 29, 2, False, True),
    BlockSpec(128, 1, 1, 1, False, False),
)


@dataclass(frozen=True)
class MarbleNetConfig:
    n_mels: int = 80
    blocks: Tuple[BlockSpec, ...] = DEFAULT_BLOCKS
    num_classes: int = 2


class MarbleBlock(nn.Module):
    """One Jasper-style block: repeat x (conv -> BN -> ReLU), optional
    pointwise residual. Submodule names match titanet_convert's
    shape-driven block converter (conv_r/{dw,pw}, bn_r, res_pw, res_bn)."""
    spec: BlockSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        b = self.spec
        inp = x
        for r in range(b.repeat):
            h = x * mask
            pad = b.dilation * (b.kernel - 1) // 2
            if b.separable:
                h = nn.Conv(h.shape[-1], kernel_size=(b.kernel,),
                            padding=[(pad, pad)],
                            kernel_dilation=(b.dilation,),
                            feature_group_count=h.shape[-1], use_bias=False,
                            dtype=self.dtype, name=f"conv_{r}_dw")(h)
                h = nn.Conv(b.filters, kernel_size=(1,), use_bias=False,
                            dtype=self.dtype, name=f"conv_{r}_pw")(h)
            else:
                h = nn.Conv(b.filters, kernel_size=(b.kernel,),
                            padding=[(pad, pad)],
                            kernel_dilation=(b.dilation,), use_bias=False,
                            dtype=self.dtype, name=f"conv_{r}_full")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, name=f"bn_{r}")(h)
            if r < b.repeat - 1:
                h = nn.relu(h)
            x = h
        if b.residual:
            res = nn.Conv(b.filters, kernel_size=(1,), use_bias=False,
                          dtype=self.dtype, name="res_pw")(inp)
            res = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-3, name="res_bn")(res)
            x = x + res
        return nn.relu(x)


class MarbleNet(nn.Module):
    cfg: MarbleNetConfig = field(default_factory=MarbleNetConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, lengths, train: bool = False):
        """feats: [B, n_mels, T]; lengths: [B] valid frames.
        Returns per-frame class logits [B, T, num_classes]."""
        x = jnp.swapaxes(feats, 1, 2)  # [B, T, n_mels]
        T = x.shape[1]
        mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        mask = mask.astype(x.dtype)
        for bi, spec in enumerate(self.cfg.blocks):
            x = MarbleBlock(spec, self.dtype, name=f"block_{bi}")(
                x, mask, train)
        return nn.Dense(self.cfg.num_classes, dtype=self.dtype,
                        name="classifier")(x)


# ---------------------------------------------------------------------------
# NeMo checkpoint conversion (shape-driven, same approach as titanet_convert)
# ---------------------------------------------------------------------------

def blocks_from_nemo_config(cfg_yaml: dict) -> Tuple[BlockSpec, ...]:
    """Build BlockSpecs from a NeMo model_config.yaml 'jasper' block list."""
    enc = cfg_yaml.get("encoder", {})
    jasper = enc.get("jasper") or enc.get("params", {}).get("jasper")
    if not jasper:
        raise ValueError("no encoder.jasper block list in NeMo config")

    def one(v):
        return v[0] if isinstance(v, (list, tuple)) else v

    return tuple(BlockSpec(int(j["filters"]), int(j.get("repeat", 1)),
                           int(one(j["kernel"])),
                           int(one(j.get("dilation", 1))),
                           bool(j.get("residual", False)),
                           bool(j.get("separable", False)))
                 for j in jasper)


def convert_nemo_marblenet(sd: Dict[str, np.ndarray],
                           cfg: MarbleNetConfig) -> Dict:
    """NeMo EncDecClassificationModel state dict -> flax variables.

    Shape-driven within each encoder block: depthwise [C,1,k], pointwise
    [C2,C,1] (or full conv when the block is non-separable), batch-norms by
    their running stats, residual branches by '.res' in the key. The
    classifier is the 2-class linear of ConvASRDecoderClassification."""
    import re
    from collections import defaultdict
    from notsofar_tpu.models.titanet_convert import _dw, _pw, _t_lin

    raw_blocks: Dict[int, Dict[str, np.ndarray]] = defaultdict(dict)
    for k, v in sd.items():
        m = re.match(r"encoder\.encoder\.(\d+)\.(.+)", k)
        if m:
            raw_blocks[int(m.group(1))][m.group(2)] = np.asarray(v)
    if len(raw_blocks) != len(cfg.blocks):
        raise ValueError(f"checkpoint has {len(raw_blocks)} encoder blocks, "
                         f"config expects {len(cfg.blocks)}")

    params: Dict = {}
    stats: Dict = {}
    for bi, spec in enumerate(cfg.blocks):
        raw = raw_blocks[bi]
        conv3d, bns = [], []
        res_pw = None
        res_bn: Dict[str, np.ndarray] = {}
        bn_parts: Dict[str, list] = defaultdict(list)
        for k in sorted(raw):
            v = raw[k]
            is_res = ".res" in k or k.startswith("res")
            if v.ndim == 3:
                if is_res:
                    res_pw = _pw(v)
                else:
                    conv3d.append(v)
            elif k.endswith("running_mean"):
                (res_bn.__setitem__("mean", v) if is_res
                 else bn_parts["mean"].append(v))
            elif k.endswith("running_var"):
                (res_bn.__setitem__("var", v) if is_res
                 else bn_parts["var"].append(v))
            elif k.endswith(".weight") and v.ndim == 1:
                (res_bn.__setitem__("scale", v) if is_res
                 else bn_parts["scale"].append(v))
            elif k.endswith(".bias") and v.ndim == 1:
                (res_bn.__setitem__("bias", v) if is_res
                 else bn_parts["bias"].append(v))
        bp: Dict = {}
        bs: Dict = {}
        ci = 0
        for r in range(spec.repeat):
            if spec.separable:
                dw_w, pw_w = conv3d[ci], conv3d[ci + 1]
                if dw_w.shape[1] != 1:  # order not guaranteed by key sort
                    dw_w, pw_w = pw_w, dw_w
                assert dw_w.shape[1] == 1 and pw_w.shape[2] == 1, \
                    f"block {bi} rep {r}: not separable-shaped " \
                    f"({dw_w.shape}, {pw_w.shape})"
                bp[f"conv_{r}_dw"] = {"kernel": _dw(dw_w)}
                bp[f"conv_{r}_pw"] = {"kernel": _pw(pw_w)}
                ci += 2
            else:
                w = conv3d[ci]  # [C_out, C_in, k]
                bp[f"conv_{r}_full"] = {
                    "kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
                ci += 1
            bp[f"bn_{r}"] = {"scale": bn_parts["scale"][r],
                             "bias": bn_parts["bias"][r]}
            bs[f"bn_{r}"] = {"mean": bn_parts["mean"][r],
                             "var": bn_parts["var"][r]}
        assert ci == len(conv3d), \
            f"block {bi}: {len(conv3d) - ci} unconsumed conv weights"
        if spec.residual:
            assert res_pw is not None, f"block {bi}: residual conv missing"
            bp["res_pw"] = {"kernel": res_pw}
            bp["res_bn"] = {"scale": res_bn["scale"], "bias": res_bn["bias"]}
            bs["res_bn"] = {"mean": res_bn["mean"], "var": res_bn["var"]}
        params[f"block_{bi}"] = bp
        if bs:
            stats[f"block_{bi}"] = bs

    lin = sorted((k, np.asarray(v)) for k, v in sd.items()
                 if k.startswith("decoder") and np.asarray(v).ndim == 2
                 and np.asarray(v).shape[0] == cfg.num_classes)
    if not lin:
        raise ValueError("classifier linear not found in decoder keys")
    w = lin[0][1]
    bias_key = lin[0][0].rsplit(".", 1)[0] + ".bias"
    params["classifier"] = {
        "kernel": _t_lin(w),
        "bias": np.asarray(sd.get(bias_key,
                                  np.zeros(cfg.num_classes, np.float32)))}
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Frame-VAD entry point (vad_fn-compatible: (wav, sr) -> bool mask @ 10 ms)
# ---------------------------------------------------------------------------

class FrameVAD:
    """Bundle of (MarbleNet, variables) exposing the diarizer's vad_fn
    interface at VAD_TIME_RESOLUTION (10 ms)."""

    @staticmethod
    def from_checkpoint(path, cfg: MarbleNetConfig = None,
                        threshold: float = 0.5) -> "FrameVAD":
        from notsofar_tpu.models.titanet_convert import load_nemo_archive
        if str(path).endswith(".nemo"):
            sd, cfg_yaml = load_nemo_archive(path)
            if cfg is None:
                try:
                    blocks = blocks_from_nemo_config(cfg_yaml)
                    n_mels = int(cfg_yaml.get("preprocessor", {})
                                 .get("features", 80))
                    cfg = MarbleNetConfig(n_mels=n_mels, blocks=blocks)
                except (ValueError, KeyError) as e:
                    _LOG.warning(f"could not parse NeMo config ({e}); "
                                 "using default MarbleNet topology")
                    cfg = MarbleNetConfig()
        else:
            import torch
            raw = torch.load(path, map_location="cpu", weights_only=False)
            raw = raw.get("state_dict", raw)
            sd = {k: v.detach().cpu().numpy() for k, v in raw.items()}
            cfg = cfg or MarbleNetConfig()
        variables = convert_nemo_marblenet(sd, cfg)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        return FrameVAD(cfg, variables=variables, threshold=threshold)

    def __init__(self, cfg: MarbleNetConfig = None, variables=None,
                 rng=None, threshold: float = 0.5):
        self.cfg = cfg or MarbleNetConfig()
        self.module = MarbleNet(self.cfg)
        self.threshold = threshold
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            feats = jnp.zeros((1, self.cfg.n_mels, 50), jnp.float32)
            variables = self.module.init(rng, feats, jnp.asarray([50]))
        self.variables = variables

    @partial(jax.jit, static_argnums=0)
    def _frame_probs(self, variables, wavs, lengths_samples):
        feats = titanet_features(wavs, n_mels=self.cfg.n_mels)
        frame_lengths = lengths_samples // 160 + 1
        logits = self.module.apply(variables, feats, frame_lengths)
        return jax.nn.softmax(logits, axis=-1)[..., 1]  # P(speech)

    def frame_probs(self, wavs: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """wavs: [B, T] zero-padded 16 kHz; lengths: [B] valid samples ->
        [B, frames] speech probabilities at 10 ms."""
        return np.asarray(self._frame_probs(self.variables, jnp.asarray(wavs),
                                            jnp.asarray(lengths)))

    def __call__(self, wav: np.ndarray, sr: int) -> np.ndarray:
        """vad_fn interface: 1-D waveform -> boolean speech mask @ 10 ms."""
        assert sr == 16000, "resample to 16 kHz before VAD"
        wav = np.asarray(wav, np.float32)[None]
        probs = self.frame_probs(wav, np.asarray([wav.shape[1]]))[0]
        n = wav.shape[1] // 160  # match energy_vad's frame count
        return probs[:n] > self.threshold
