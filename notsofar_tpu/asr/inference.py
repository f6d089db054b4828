"""ASR inference module: per-session transcription of CSS streams.

Rebuild of /root/reference/asr/asr.py:31-101 with the same contracts:

* input: session row with `sep_wav_file_names` (the CSS output streams),
* output: segments dataframe with columns start_time, end_time, text,
  word_timing ([[word, start, end], ...]), meeting_id, session_id,
  wav_file_name,
* per-session pickle cache under out_dir/asr/{session_id}/{model}/.

Model loading: checkpoints are resolved under `models_dir` as
{models_dir}/whisper/{model_name}.pt (openai-whisper format, converted on
load). When no checkpoint is present, a deterministic random-initialized
model of the right dimensions is used so the pipeline stays runnable for
integration tests (clearly logged — transcription quality then carries no
meaning).
"""
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import numpy as np
import pandas as pd

from notsofar_tpu.asr.tokenizer import WhisperTokenizer, load_tokenizer
from notsofar_tpu.asr.transcribe import TranscribeOptions, WhisperTranscriber
from notsofar_tpu.models.whisper import (WHISPER_DIMS, WhisperModel,
                                         load_openai_whisper_checkpoint)
from notsofar_tpu.utils.audio import read_wav_scaled
from notsofar_tpu.utils.logging_def import get_logger
from notsofar_tpu.utils.text_norm import get_txt_norm

_LOG = get_logger("asr")


@dataclass
class WhisperAsrCfg:
    """Mirror of WhisperAsrCfg (asr/asr.py:15-28)."""
    model_name: str = "large-v2"
    language: Optional[str] = "en"
    word_level_time_stamps: bool = True
    beam_size: Optional[int] = 5
    hallucination_silence_threshold: Optional[float] = 2.0
    vocab_path: Optional[str] = None
    max_new_tokens: int = 224  # decode-step budget per 30 s window
    # TPU extension: matmul + weight dtype ('bfloat16' mirrors the
    # fp16=True GPU default the reference inherits from openai-whisper;
    # 'float32' for strict-parity runs)
    compute_dtype: str = "bfloat16"
    # TPU extension (no reference counterpart): cross-session stream
    # batching width for asr_batch_prepass. The per-session path batches a
    # session's ~3 CSS streams; the prepass concatenates streams across
    # sessions into batches of this size so encoder/decoder dispatches stay
    # full. <=1 disables the prepass (per-session behavior only).
    batch_streams: int = 9

    def text_normalizer(self):
        return get_txt_norm("chime8")

    def assert_valid(self):
        assert self.model_name in ["tiny.en", "tiny", "base.en", "base",
                                   "small.en", "small", "medium.en", "medium",
                                   "large-v1", "large-v2", "large-v3", "large"]


_MODEL_CACHE: Dict[str, Tuple[WhisperModel, dict, WhisperTokenizer,
                              Optional[list]]] = {}


def _load_alignment_heads(ckpt: Path, dims) -> Optional[list]:
    """Optional `<ckpt stem>.alignment_heads.json` sidecar: either a list
    of [layer, head] pairs or {"blob": "<base85 gzip mask>"} in the format
    the whisper pip package hardcodes per model."""
    import json
    side = ckpt.with_suffix(".alignment_heads.json")
    if not side.exists():
        return None
    data = json.loads(side.read_text())
    if isinstance(data, dict) and "blob" in data:
        from notsofar_tpu.asr.decoding import decode_alignment_heads
        heads = decode_alignment_heads(data["blob"], dims.n_text_layer,
                                       dims.n_text_head)
    else:
        heads = [(int(l), int(h)) for l, h in data]
    _LOG.info(f"Loaded {len(heads)} alignment heads from {side}")
    return heads


def load_whisper_model(model_name: str, models_dir: Optional[str] = None,
                       vocab_path: Optional[str] = None,
                       language: str = "en",
                       compute_dtype: str = "bfloat16"
                       ) -> Tuple[WhisperModel, dict, WhisperTokenizer,
                                  Optional[list]]:
    """Load (model, variables, tokenizer, alignment_heads); cached per
    model name.

    compute_dtype 'bfloat16' (default) runs matmuls AND stores weights in
    bf16 — the TPU analogue of the fp16=True default the reference
    inherits from openai-whisper on GPU (asr/asr.py:74); f32 weights for
    large-v3 alone are ~6 GB of HBM and 4x slower on the v5e MXU. Pass
    'float32' for strict-parity runs. 'int8' keeps bf16 compute but stores
    the DECODER matrices weight-only int8 (models/whisper.py::QuantDense)
    — incremental decode is weight-read-bound, so this roughly halves the
    decode stage. Accuracy evidence so far: greedy tokens agree with bf16
    everywhere on RANDOM weights and logit cosine stays >0.99 under
    sculpted outlier-channel statistics (tests/test_whisper.py::
    test_int8_decoder_parity / test_int8_decoder_outlier_channels); the
    on-real-weights cost is measured by tools/validate_real_weights.py's
    int8-wer-delta stage on first mount — run it before trusting int8 as
    the accuracy configuration."""
    key = f"{models_dir}/{model_name}/{compute_dtype}"
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    ckpt = None
    if models_dir is not None:
        for cand in (Path(models_dir) / "whisper" / f"{model_name}.pt",
                     Path(models_dir) / f"{model_name}.pt"):
            if cand.exists():
                ckpt = cand
                break
    import jax.numpy as jnp
    quant = compute_dtype == "int8"
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
             "int8": jnp.bfloat16}[compute_dtype]
    alignment_heads = None
    if ckpt is not None:
        _LOG.info(f"Loading Whisper checkpoint: {ckpt}")
        variables, dims = load_openai_whisper_checkpoint(ckpt)
        model = WhisperModel(dims, dtype=dtype, quant_decoder=quant)
        variables = jax.tree_util.tree_map(np.asarray, variables)
        alignment_heads = _load_alignment_heads(ckpt, dims)
    else:
        dims = WHISPER_DIMS[model_name]
        _LOG.warning(
            f"No Whisper checkpoint found for '{model_name}' under "
            f"{models_dir} — using RANDOM weights (pipeline smoke mode; "
            "transcripts are meaningless)")
        model = WhisperModel(dims, dtype=dtype, quant_decoder=quant)
        variables = WhisperModel(dims, dtype=dtype).init(
            jax.random.PRNGKey(0))
    if dtype == jnp.bfloat16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == np.float32 else x,
            variables)
    if quant:
        # quantize AFTER the bf16 cast: bf16 storage is the serving
        # baseline the int8 path approximates, and the per-channel scales
        # come out float32 (QuantDense keeps them f32 for exact dequant)
        from notsofar_tpu.models.whisper import quantize_whisper_decoder
        variables = quantize_whisper_decoder(variables)
    tokenizer = load_tokenizer(model_name, dims.n_vocab,
                               vocab_path=vocab_path, language=language)
    _MODEL_CACHE[key] = (model, variables, tokenizer, alignment_heads)
    return _MODEL_CACHE[key]


def _asr_cache_path(out_dir: str, session: pd.Series,
                    cfg: WhisperAsrCfg) -> Path:
    return Path(out_dir) / "asr" / session.session_id / cfg.model_name \
        / "all_segments_df.pkl"


def _make_transcriber(cfg: WhisperAsrCfg,
                      models_dir: Optional[str]) -> "WhisperTranscriber":
    model, variables, tokenizer, alignment_heads = load_whisper_model(
        cfg.model_name, models_dir, cfg.vocab_path,
        language=cfg.language or "en", compute_dtype=cfg.compute_dtype)
    return WhisperTranscriber(
        model, variables, tokenizer,
        TranscribeOptions(
            language=cfg.language or "en",
            word_timestamps=cfg.word_level_time_stamps,
            hallucination_silence_threshold=cfg.hallucination_silence_threshold,
            max_new_tokens=cfg.max_new_tokens,
            beam_size=cfg.beam_size,
            alignment_heads=alignment_heads))


def _read_stream(wav_file) -> np.ndarray:
    wav, _ = read_wav_scaled(str(wav_file))
    return wav[:, 0] if wav.ndim > 1 else wav


def _results_to_df(session: pd.Series, wav_files: list,
                   results_per_stream: list) -> pd.DataFrame:
    """Build the per-session segments dataframe (asr/asr.py:75-98 layout)."""
    segments_dfs = []
    for wav_file, results in zip(wav_files, results_per_stream):
        if len(results["segments"]) == 0:
            _LOG.warning(f"No segments returned for {wav_file}")
            continue
        rows = []
        for seg in results["segments"]:
            rows.append(dict(
                start_time=seg["start"], end_time=seg["end"],
                text=seg["text"],
                word_timing=[[w["word"], w["start"], w["end"]]
                             for w in seg["words"]]))
        df = pd.DataFrame(rows)
        df["meeting_id"] = session.meeting_id
        df["session_id"] = session.session_id
        df["wav_file_name"] = wav_file
        segments_dfs.append(df)

    if not segments_dfs:
        all_segments_df = pd.DataFrame(columns=[
            "start_time", "end_time", "text", "word_timing", "meeting_id",
            "session_id", "wav_file_name"])
        all_segments_df["meeting_id"] = [session.meeting_id][:0]
    else:
        all_segments_df = pd.concat(segments_dfs, ignore_index=True)
    return all_segments_df


def asr_batch_prepass(out_dir: str, sessions: list, cfg: WhisperAsrCfg,
                      fetch_from_cache: bool,
                      models_dir: Optional[str] = None) -> None:
    """Transcribe all sessions' separated streams in cross-session batches.

    TPU front-end with no reference counterpart (the reference loops
    sessions serially, asr/asr.py:31-101 via inference_pipeline.py). The
    per-session asr_inference path batches one session's ~3 CSS streams;
    here the streams of MANY sessions are flattened and sliced into
    batches of cfg.batch_streams, so every encoder/decoder dispatch is
    full even at the tail of a session. Results land in the standard
    per-session pickle cache which asr_inference then reads.
    """
    cfg.assert_valid()
    todo = [s for s in sessions
            if not (fetch_from_cache
                    and _asr_cache_path(out_dir, s, cfg).exists())]
    if not todo:
        return
    transcriber = _make_transcriber(cfg, models_dir)

    flat_wavs, owner = [], []  # owner[i] = index into todo
    for si, session in enumerate(todo):
        assert isinstance(session.sep_wav_file_names, list)
        for wav_file in session.sep_wav_file_names:
            flat_wavs.append(_read_stream(wav_file))
            owner.append(si)
    _LOG.info(f"ASR prepass: {len(flat_wavs)} streams across {len(todo)} "
              f"sessions, batch width {cfg.batch_streams}")

    results = []
    if hasattr(transcriber, "transcribe_batch"):
        bs = max(1, cfg.batch_streams)
        for i in range(0, len(flat_wavs), bs):
            results.extend(transcriber.transcribe_batch(flat_wavs[i:i + bs]))
    else:  # test stubs provide only transcribe()
        results = [transcriber.transcribe(w) for w in flat_wavs]

    for si, session in enumerate(todo):
        res = [r for r, o in zip(results, owner) if o == si]
        df = _results_to_df(session, session.sep_wav_file_names, res)
        out_file = _asr_cache_path(out_dir, session, cfg)
        out_file.parent.mkdir(parents=True, exist_ok=True)
        df.to_pickle(out_file)
        _LOG.info(f"ASR prepass results saved to {out_file}")


def asr_inference(out_dir: str, session: pd.Series, cfg: WhisperAsrCfg,
                  fetch_from_cache: bool,
                  models_dir: Optional[str] = None) -> pd.DataFrame:
    """Transcribe every separated stream of a session. Contract parity with
    asr/asr.py:31-101."""
    _LOG.info("Running ASR")
    cfg.assert_valid()

    wav_files = session.sep_wav_file_names
    assert isinstance(wav_files, list)

    out_file = _asr_cache_path(out_dir, session, cfg)
    if fetch_from_cache and out_file.exists():
        _LOG.info(f"Loading ASR results from {out_file}")
        return pd.read_pickle(out_file)

    transcriber = _make_transcriber(cfg, models_dir)

    _LOG.info(f"Running ASR on {len(wav_files)} streams (batched)")
    wavs = [_read_stream(w) for w in wav_files]
    if hasattr(transcriber, "transcribe_batch"):
        results_per_stream = transcriber.transcribe_batch(wavs)
    else:  # test stubs provide only transcribe()
        results_per_stream = [transcriber.transcribe(w) for w in wavs]
    all_segments_df = _results_to_df(session, wav_files, results_per_stream)

    out_file.parent.mkdir(parents=True, exist_ok=True)
    all_segments_df.to_pickle(out_file)
    _LOG.info(f"ASR results saved to {out_file}")
    return all_segments_df
