"""CSS module-level inference: session row -> separated wav streams.

Rebuild of css_inference + model loading (/root/reference/css/css.py:51-107,
css/helpers.py:14-37) with the same filesystem contract:

* outputs under out_dir/css_inference/{session_id}/sep_stream{i}.wav plus
  input_mixture.wav;
* `fetch_from_cache` returns existing sep*.wav;
* `pass_through_ch0` bypasses CSS entirely;
* model directories hold either the reference format (*.yaml + *.pt torch
  checkpoint — converted on load) or this framework's native format
  (*.yaml + params.msgpack from `save_css_model`).
"""
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import numpy as np
import pandas as pd

from notsofar_tpu.css.engine import CssCfg, CssEngine
from notsofar_tpu.models.convert import (convert_css_state_dict,
                                         load_torch_checkpoint)
from notsofar_tpu.models.css_wrapper import CssModel
from notsofar_tpu.training.config import TrainCfg
from notsofar_tpu.utils.audio import load_session_audio, write_wav
from notsofar_tpu.utils.conf import load_yaml_to_dataclass
from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("css")

_ENGINE_CACHE: Dict[str, CssEngine] = {}


def save_css_model(model_dir, variables, train_cfg: TrainCfg):
    """Write the native checkpoint format (config.yaml + params.msgpack)."""
    import yaml
    from flax import serialization
    from notsofar_tpu.utils.conf import dataclass_to_dict
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    (model_dir / "config.yaml").write_text(
        yaml.safe_dump(dataclass_to_dict(train_cfg)))
    (model_dir / "params.msgpack").write_bytes(
        serialization.to_bytes(jax.device_get(variables)))


def load_css_model(model_dir, compute_dtype: str = "float32"
                   ) -> Tuple[CssModel, Dict, TrainCfg]:
    """Load a CSS model from either checkpoint format."""
    import jax.numpy as jnp
    model_dir = Path(model_dir)
    yamls = sorted(model_dir.glob("*.yaml"))
    if not yamls:
        raise FileNotFoundError(f"expecting a yaml config in {model_dir}")
    train_cfg = load_yaml_to_dataclass(str(yamls[0]), TrainCfg)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[compute_dtype]
    model = CssModel(train_cfg.conformer_css_cfg.freeze(), dtype=dtype)

    msgpack = model_dir / "params.msgpack"
    pts = sorted(model_dir.glob("*.pt"))
    if msgpack.exists():
        from flax import serialization
        template = jax.device_get(model.init(jax.random.PRNGKey(0)))
        variables = serialization.from_bytes(template, msgpack.read_bytes())
    elif pts:
        _LOG.info(f"Converting torch checkpoint {pts[0]}")
        sd = load_torch_checkpoint(pts[0])
        variables = convert_css_state_dict(
            sd, train_cfg.conformer_css_cfg.nnet_conf.conformer_conf.num_blocks)
    else:
        raise FileNotFoundError(
            f"no checkpoint (params.msgpack or *.pt) in {model_dir}")
    variables = jax.tree_util.tree_map(np.asarray, variables)
    return model, variables, train_cfg


def get_css_engine(models_dir, checkpoint_rel: str, cfg: CssCfg) -> CssEngine:
    key = f"{Path(models_dir) / checkpoint_rel}|{cfg.compute_dtype}"
    if key not in _ENGINE_CACHE:
        model, variables, _ = load_css_model(
            str(Path(models_dir) / checkpoint_rel),
            compute_dtype=cfg.compute_dtype)
        _ENGINE_CACHE[key] = CssEngine(model, variables, cfg)
    return _ENGINE_CACHE[key]


def css_batch_prepass(out_dir: str, models_dir: str,
                      sessions: pd.DataFrame, cfg: CssCfg,
                      fetch_from_cache: bool):
    """Separate many sessions with batched dispatches (cfg.batch_sessions
    per program), writing the same per-session wav layout css_inference
    reads back. Groups sessions by mic count; the per-session loop then
    hits these results as cache.

    This is the TPU-idiomatic front-end for full-dataset runs — the
    per-session contract (css/css.py:51-107) is unchanged, throughput
    roughly doubles versus one-session dispatches (bench.py).
    """
    if cfg.pass_through_ch0 or cfg.batch_sessions <= 1:
        return
    todo = []
    for _, session in sessions.iterrows():
        css_out_dir = Path(out_dir) / "css_inference" / session.session_id
        if fetch_from_cache and sorted(css_out_dir.glob("sep*.wav")):
            continue
        todo.append(session)
    if not todo:
        return
    by_mc: Dict[bool, list] = {}
    for s in todo:
        by_mc.setdefault(bool(s.is_mc), []).append(s)
    for is_mc, group in by_mc.items():
        engine = get_css_engine(
            models_dir, cfg.checkpoint_mc if is_mc else cfg.checkpoint_sc, cfg)
        for i in range(0, len(group), cfg.batch_sessions):
            chunk = group[i:i + cfg.batch_sessions]
            mixes, srs = [], []
            for s in chunk:
                mix, sr = load_session_audio(s.wav_file_names, is_mc=is_mc)
                if cfg.slice_audio_for_debug:
                    mix = mix[:, sr * 20:sr * 30, :]
                mixes.append(mix)
                srs.append(sr)
            _LOG.info(f"CSS batched prepass: separating {len(chunk)} "
                      f"{'MC' if is_mc else 'SC'} sessions in one dispatch")
            results = engine.separate_sessions_batch(mixes, srs[0])
            for s, mix, wavs in zip(chunk, mixes, results):
                css_out_dir = Path(out_dir) / "css_inference" / s.session_id
                write_wav(css_out_dir / "input_mixture.wav",
                          samps=mix[0, :, 0], sr=srs[0])
                for k, w in enumerate(wavs):
                    write_wav(css_out_dir / f"sep_stream{k}.wav", samps=w,
                              sr=srs[0])


def css_inference(out_dir: str, models_dir: str, session: pd.Series,
                  cfg: CssCfg, fetch_from_cache: bool) -> pd.Series:
    """Separate one session into cfg.num_spks wav streams.

    Contract parity with css_inference (css/css.py:51-107): adds the
    `sep_wav_file_names` column to the session row.
    """
    _LOG.info("Running CSS (Continuous Speech Separation)")
    session_css = session.copy()
    assert isinstance(session.wav_file_names, list)

    if cfg.pass_through_ch0:
        session_css["sep_wav_file_names"] = session.wav_file_names[0:1]
        return session_css

    css_out_dir = Path(out_dir) / "css_inference" / session.session_id
    if fetch_from_cache and css_out_dir.exists():
        cached = sorted(css_out_dir.glob("sep*.wav"))
        if cached:
            session_css["sep_wav_file_names"] = [str(p) for p in cached]
            return session_css

    engine = get_css_engine(
        models_dir, cfg.checkpoint_mc if session.is_mc else cfg.checkpoint_sc,
        cfg)
    mixwav, sr = load_session_audio(session.wav_file_names,
                                    is_mc=session.is_mc)
    if cfg.slice_audio_for_debug:
        mixwav = mixwav[:, sr * 20:sr * 30, :]

    separated_wavs, _ = engine.separate_and_stitch(mixwav, sr,
                                                   return_side_info=False)

    write_wav(css_out_dir / "input_mixture.wav", samps=mixwav[0, :, 0], sr=sr)
    sep_names = []
    for i, w in enumerate(separated_wavs):
        filename = css_out_dir / f"sep_stream{i}.wav"
        _LOG.info(f"CSS: saving separated wav to {filename}")
        write_wav(filename, samps=w, sr=sr)
        sep_names.append(str(filename))
    session_css["sep_wav_file_names"] = sep_names
    return session_css
