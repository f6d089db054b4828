"""The session orchestrator: CSS -> ASR -> diarization -> scoring.

Rebuild of /root/reference/inference_pipeline/inference.py:20-156 with the
same module contracts, hypothesis json formats, and per-session WER
reporting. Sessions are processed independently (no cross-session
information, inference.py:58); on a multi-process JAX deployment each
process takes a strided slice of the session table
(parallel.mesh.shard_sessions).
"""
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import pandas as pd

from notsofar_tpu.asr.inference import WhisperAsrCfg, asr_inference
from notsofar_tpu.css.engine import CssCfg
from notsofar_tpu.css.inference import css_inference
from notsofar_tpu.diarization.common import DiarizationCfg
from notsofar_tpu.diarization.diarization import diarization_inference
from notsofar_tpu.inference_pipeline.load_meeting_data import load_data
from notsofar_tpu.parallel.mesh import shard_sessions
from notsofar_tpu.utils.logging_def import get_logger
from notsofar_tpu.utils.scoring import (ScoringCfg, calc_wer, df_to_seglst,
                                        normalize_segment,
                                        write_submission_jsons)

_LOG = get_logger("inference")


@dataclass
class InferenceCfg:
    """Mirror of InferenceCfg (inference.py:20-27)."""
    css: CssCfg = field(default_factory=CssCfg)
    asr: WhisperAsrCfg = field(default_factory=WhisperAsrCfg)
    diarization: DiarizationCfg = field(default_factory=DiarizationCfg)
    scoring: ScoringCfg = field(default_factory=ScoringCfg)
    session_query: Optional[str] = None


@dataclass
class FetchFromCacheCfg:
    css: bool = False
    asr: bool = False
    diarization: bool = False


def inference_pipeline(meetings_dir: str, models_dir: str, out_dir: str,
                       cfg: InferenceCfg, cache: FetchFromCacheCfg):
    """Run the full pipeline over every session under meetings_dir."""
    _LOG.info(f"loading meetings from: {meetings_dir}")
    all_session_df, all_gt_utt_df, _ = load_data(meetings_dir,
                                                 cfg.session_query)

    my_rows = shard_sessions(len(all_session_df))

    # TPU-idiomatic front-end: separate sessions in batched dispatches up
    # front (cfg.css.batch_sessions per program); the per-session loop then
    # reads the results back through the standard cache layout.
    css_cache = cache.css
    if cfg.css.batch_sessions > 1 and not cfg.css.pass_through_ch0:
        from notsofar_tpu.css.inference import css_batch_prepass
        css_batch_prepass(out_dir, models_dir, all_session_df.iloc[my_rows],
                          cfg.css, cache.css)
        css_cache = True

    # ASR prepass: flatten every session's separated streams into
    # cross-session batches so encoder/decoder dispatches stay full (the
    # per-session path only sees ~3 streams at a time). CSS runs first here
    # (cache-hit cheap when the CSS prepass above already ran); the main
    # loop then reuses the enriched sessions and the ASR cache.
    asr_cache = cache.asr
    enriched: dict = {}
    if cfg.asr.batch_streams > 1:
        from notsofar_tpu.asr.inference import asr_batch_prepass
        enriched = {pos: css_inference(out_dir, models_dir,
                                       all_session_df.iloc[pos], cfg.css,
                                       css_cache)
                    for pos in my_rows}
        asr_batch_prepass(out_dir, list(enriched.values()), cfg.asr,
                          cache.asr, models_dir=models_dir)
        asr_cache = True

    # Diarization prepass: all sessions' speaker-embedding windows in one
    # shared batch (per-session clustering decisions unchanged); the main
    # loop then reads the standard diarization cache.
    diar_cache = cache.diarization
    if enriched and cfg.diarization.method == "word_nmesc":
        from notsofar_tpu.diarization.diarization import \
            diarization_batch_prepass
        seg_dfs = [asr_inference(out_dir, enriched[pos], cfg.asr, True,
                                 models_dir=models_dir)
                   for pos in my_rows if pos in enriched]
        diarization_batch_prepass(out_dir, seg_dfs, cfg.diarization,
                                  cache.diarization)
        diar_cache = True

    wer_dfs, hyp_jsons = [], []
    for pos in my_rows:
        _LOG.info(f"Processing session: "
                  f"{all_session_df.iloc[pos].session_id}")

        session = enriched[pos] if pos in enriched else css_inference(
            out_dir, models_dir, all_session_df.iloc[pos], cfg.css,
            css_cache)
        segments_df = asr_inference(out_dir, session, cfg.asr, asr_cache,
                                    models_dir=models_dir)
        attributed_segments_df = diarization_inference(
            out_dir, segments_df, cfg.diarization, diar_cache)

        hyp_paths = write_hypothesis_jsons(out_dir, session,
                                           attributed_segments_df,
                                           cfg.asr.text_normalizer())
        hyp_jsons.append(hyp_paths)

        if len(attributed_segments_df) == 0:
            _LOG.warning(f"no transcribed segments for {session.session_id}; "
                         "skipping WER for this session")
            continue
        if all_gt_utt_df is not None:
            calc_wer_out = Path(out_dir) / "wer" / session.session_id
            session_wer = calc_wer(
                calc_wer_out, hyp_paths.tcp_wer_hyp_json,
                hyp_paths.tcorc_wer_hyp_json, all_gt_utt_df,
                cfg.asr.text_normalizer(), collar=5,
                save_visualizations=cfg.scoring.save_visualizations)
            wer_dfs.append(session_wer)

    hyp_jsons_df = pd.DataFrame(hyp_jsons)
    if len(hyp_jsons_df):
        write_submission_jsons(out_dir, hyp_jsons_df)

    if wer_dfs:
        all_session_wer_df = pd.concat(wer_dfs, ignore_index=True)
        _LOG.info(f"Results:\n{all_session_wer_df}")
        _LOG.info(f"mean tcp_wer = {all_session_wer_df['tcp_wer'].mean()}")
        _LOG.info(f"mean tcorc_wer = {all_session_wer_df['tcorc_wer'].mean()}")
        exp_id = "_".join(["css", cfg.asr.model_name, cfg.diarization.method])
        result_file = Path(out_dir) / "wer" / f"{exp_id}_results.csv"
        result_file.parent.mkdir(parents=True, exist_ok=True)
        all_session_wer_df.to_csv(result_file, sep="\t")
        _LOG.info(f"Wrote full results to: {result_file}")
        return all_session_wer_df
    return None


def write_hypothesis_jsons(out_dir, session: pd.Series,
                           attributed_segments_df: pd.DataFrame,
                           text_normalizer) -> pd.Series:
    """Write tcpWER + tcORC-WER hypothesis jsons for one session.

    Parity with inference.py:111-156: the tcORC stream id is the CSS
    stream (factorized wav_file_name).
    """
    _LOG.info(f"Writing hypothesis transcripts for session "
              f"{session.session_id}")

    def write_json(df, filename):
        filepath = Path(out_dir) / "wer" / session.session_id / filename
        seglst = df_to_seglst(df)
        seglst = seglst.map(lambda s: normalize_segment(s, text_normalizer))
        seglst.dump(filepath)
        _LOG.info(f"Wrote {filepath}")
        return filepath

    tcp_wer_hyp_json = write_json(attributed_segments_df, "tcp_wer_hyp.json")

    df_tcorc = attributed_segments_df.copy()
    df_tcorc["speaker_id"], uniques = pd.factorize(df_tcorc["wav_file_name"],
                                                   sort=True)
    _LOG.debug(f"Found {len(uniques)} streams for tc_orc_wer_hyp.json")
    tcorc_wer_hyp_json = write_json(df_tcorc, "tc_orc_wer_hyp.json")

    return pd.Series({
        "session_id": session.session_id,
        "tcp_wer_hyp_json": tcp_wer_hyp_json,
        "tcorc_wer_hyp_json": tcorc_wer_hyp_json,
        "is_mc": session.is_mc,
        "is_close_talk": session.is_close_talk,
    })
