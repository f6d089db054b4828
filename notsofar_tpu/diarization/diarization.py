"""Diarization dispatch: route to skip / by_wav_file_name / word_nmesc /
time-based modes.

Rebuild of /root/reference/diarization/diarization.py:15-109 with the same
contracts: input is the ASR segments dataframe of one session; output adds
a 'speaker_id' column (possibly re-segmented). The per-session pickle cache
layout is preserved.
"""
import os
from pathlib import Path
from typing import Optional

import pandas as pd

from notsofar_tpu.diarization.common import DiarizationCfg
from notsofar_tpu.diarization.time_based import time_based_diarization
from notsofar_tpu.diarization.word_based import word_based_clustering
from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("diarization")


def diarization_inference(out_dir: str, segments_df: pd.DataFrame,
                          cfg: DiarizationCfg, fetch_from_cache: bool,
                          encoder=None, msdd=None) -> pd.DataFrame:
    """Assign a speaker label to each ASR word."""
    _LOG.info("Running Speaker Diarization")
    assert segments_df.session_id.nunique() <= 1, \
        "no cross-session information is permitted"

    if cfg.method == "skip":
        _LOG.info("Skipping Diarization")
        out = segments_df.copy()
        out["speaker_id"] = "spk0"
        return out
    if cfg.method == "by_wav_file_name":
        out = segments_df.copy()
        ind, uniques = pd.factorize(out["wav_file_name"], sort=True)
        out["speaker_id"] = "wav_" + pd.Series(ind, index=out.index).astype(str)
        _LOG.info(f"Diarization by wav file names: {list(uniques)}")
        return out

    if len(segments_df) == 0:
        out = segments_df.copy()
        out["speaker_id"] = pd.Series(dtype=object)
        return out

    session_name = segments_df.session_id.iloc[0]
    is_ct = str(session_name).startswith("close_talk")
    assert segments_df.wav_file_name.nunique() <= 3 or is_ct, \
        "expecting at most three separated channels"
    output_dir = Path(out_dir) / "diarization" / session_name / cfg.method
    out_file = output_dir / "all_segments_df.pkl"

    if fetch_from_cache and out_file.exists():
        return pd.read_pickle(out_file)
    os.makedirs(output_dir, exist_ok=True)

    segments_df = segments_df.copy()
    segments_df["wav_file_name"] = segments_df["wav_file_name"].astype("category")
    assert "wav_file_name_ind" not in segments_df
    segments_df["wav_file_name_ind"] = segments_df["wav_file_name"].cat.codes
    wav_files = segments_df["wav_file_name"].cat.categories.to_list()

    if cfg.method == "word_nmesc":
        attributed = word_based_clustering(wav_files, segments_df, cfg,
                                           encoder=encoder)
    elif cfg.method in ("nmesc", "nmesc_msdd"):
        attributed = time_based_diarization(wav_files, segments_df,
                                            str(output_dir), cfg,
                                            encoder=encoder, msdd=msdd)
    else:
        raise ValueError(f"unknown diarization method: {cfg.method}")

    attributed.to_pickle(out_file)
    _LOG.info(f"Speaker Diarization saved to {out_file}")
    return attributed


def diarization_batch_prepass(out_dir: str, sessions_segments,
                              cfg: DiarizationCfg, fetch_from_cache: bool,
                              encoder=None) -> None:
    """Cross-session word_nmesc prepass (TPU extension, mirroring the
    CSS/ASR prepasses): all sessions' speaker-embedding windows run as
    one shared batch (word_based_clustering_batch) and each session's
    result lands in the standard diarization cache, so the per-session
    loop becomes cache hits. No cross-session information flows into any
    clustering decision — affinities and NMESC stay strictly per session
    (the reference's constraint, diarization.py:28)."""
    if cfg.method != "word_nmesc":
        return
    from notsofar_tpu.diarization.word_based import \
        word_based_clustering_batch
    jobs = []
    for segments_df in sessions_segments:
        if len(segments_df) == 0:
            continue
        assert segments_df.session_id.nunique() == 1
        session_name = segments_df.session_id.iloc[0]
        out_file = Path(out_dir) / "diarization" / session_name \
            / cfg.method / "all_segments_df.pkl"
        if fetch_from_cache and out_file.exists():
            continue
        df = segments_df.copy()
        df["wav_file_name"] = df["wav_file_name"].astype("category")
        df["wav_file_name_ind"] = df["wav_file_name"].cat.codes
        wav_files = df["wav_file_name"].cat.categories.to_list()
        jobs.append((out_file, wav_files, df))
    if not jobs:
        return
    _LOG.info(f"Diarization prepass: {len(jobs)} sessions in one "
              "embedding batch")
    outs = word_based_clustering_batch(
        [dict(wav_files=w, segments_df=d) for _, w, d in jobs], cfg,
        encoder=encoder)
    for (out_file, _, _), attributed in zip(jobs, outs):
        out_file.parent.mkdir(parents=True, exist_ok=True)
        attributed.to_pickle(out_file)
        _LOG.info(f"Speaker Diarization saved to {out_file}")
