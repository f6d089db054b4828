"""Full-pipeline RTFx benchmark: CSS -> ASR -> word_nmesc diarization.

Measures the COMPOSED serving throughput on one chip — the BASELINE.md
north star is pipeline RTFx on MC dev-set-1, not any single stage. The
load mirrors the shipped baseline system at full scale with random
weights (identical FLOPs/memory traffic to serving real checkpoints):

  CSS   conformer1.0-large (18L/512d) bf16, batched sessions, MVDR
  ASR   whisper large-v3 (32L/1280d) bf16, lockstep-batched streams,
        word-timestamp DTW pass included
  diar  TitaNet-large embeddings at the 6 shipped scales + NMESC
        spectral clustering, via the real word_based_clustering path
        (including the wav re-reads from disk)

Determinism: a random whisper model's sampled tokens would make the seek
loop (and so the FLOP count) random, so the bench decoder runs the real
decode scan for a FIXED 80 steps per window (realistic speech density:
whisper emits ~2.5 tokens/audio-sec) with EOT latching disabled, then
substitutes a fixed token template (two timestamped segments, ~72 words
per 30 s window) so segmentation, the DTW word-timestamp pass, and the
diarization word load all follow the nominal full-window path.

    python bench_pipeline.py [--sessions 4] [--seconds 120]

Round-4 structure: batches run as a PIPELINE — batch k's diarization
executes on a side thread under batch k+1's CSS/ASR (the VERDICT r3
item-1c overlap), and the headline value is the aggregate audio/wall
over ALL batches: nothing is cherry-picked and there is no early stop.
The JSON carries every batch's per-stage breakdown (`runs`), the serial
per-batch median and spread, and the analytic MFU accounting.

Prints ONE JSON line {"metric": "pipeline_mc_rtfx", ...}; per-stage
timings go to stderr.
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def build_template(tok, n_words: int = 72):
    """Fixed per-window token template: two timestamp-delimited segments
    ending with a single trailing timestamp (=> full-window seek)."""
    word = tok.encode(" a")
    # byte-fallback vocabularies split words into per-byte tokens; keep
    # the teacher-forced pass within the 448-token decoder context
    n_words = min(n_words, 170 // max(len(word), 1))
    half = n_words // 2
    ts = tok.timestamp_begin
    tokens = [ts + 0]
    tokens += word * half
    tokens += [ts + 700, ts + 700]          # 14.0 s pair
    tokens += word * (n_words - half)
    tokens += [ts + 1475]                   # 29.5 s single ending
    return tokens


class BenchDecoder:
    """Runs the real decode scan for a fixed step count, returns template
    tokens. FLOP-faithful, control-flow deterministic."""

    def __init__(self, inner, template):
        self.inner = inner
        self.template = template
        inner._eot = inner.model.dims.n_vocab + 1   # never latches -> fixed steps
        self.rows = 0        # decode rows (row x step amortizes weights)
        self.chunks = 0      # dispatches (each step reads all weights once)

    def _count(self, B):
        cap = max(self.inner.opt.max_rows_per_dispatch, 1)
        self.rows += B
        self.chunks += -(-B // cap)

    def decode(self, variables, xa, prompt=None, **kw):
        import jax
        res = self.inner.decode(variables, xa, prompt, **kw)
        jax.block_until_ready(res["no_speech_prob"])
        B = xa.shape[0]
        self._count(B)
        return dict(tokens=[list(self.template) for _ in range(B)],
                    avg_logprob=np.full(B, -0.3),
                    no_speech_prob=np.zeros(B))

    def decode_prompted(self, variables, xa, prompts, **kw):
        import jax
        res = self.inner.decode_prompted(variables, xa, prompts, **kw)
        jax.block_until_ready(res["no_speech_prob"])
        B = xa.shape[0]
        self._count(B)
        return dict(tokens=[list(self.template) for _ in range(B)],
                    avg_logprob=np.full(B, -0.3),
                    no_speech_prob=np.zeros(B))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--asr-model", default="large-v3")
    ap.add_argument("--asr-dtype", default="int8",
                    choices=["bfloat16", "int8"],
                    help="ASR weight storage: int8 (default) quantizes the "
                    "decoder matrices weight-only (the serving config; "
                    "decode is weight-read-bound), bfloat16 for the "
                    "unquantized number")
    ap.add_argument("--decode-steps", type=int, default=80)
    ap.add_argument("--parity-asr", action="store_true",
                    help="reference decode recipe: beam-5 + "
                    "condition_on_previous_text (batched-prompt path) "
                    "instead of lockstep greedy")
    ap.add_argument("--no-parity-tail", action="store_true",
                    help="skip the parity-recipe tail measurement (one "
                    "beam-5+conditioned batch appended after the "
                    "pipelined greedy runs; reported as `parity` in the "
                    "JSON so every bench records the accuracy "
                    "configuration's throughput next to the serving one)")
    args = ap.parse_args()
    if args.repeats < 1:
        ap.error("--repeats must be >= 1 (the pipeline loop and the "
                 "median stats require at least one timed batch)")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    from notsofar_tpu.asr.decoding import DecodeOptions, GreedyDecoder
    from notsofar_tpu.asr.tokenizer import load_tokenizer
    from notsofar_tpu.asr.transcribe import (TranscribeOptions,
                                             WhisperTranscriber)
    from notsofar_tpu.css.engine import CssCfg, CssEngine
    from notsofar_tpu.diarization.common import DiarizationCfg
    from notsofar_tpu.diarization.word_based import (
        word_based_clustering_batch)
    from notsofar_tpu.models.css_wrapper import (ConformerCssConfig, CssModel,
                                                 NnetConfig,
                                                 large_conformer_config)
    from notsofar_tpu.models.titanet import SpeakerEncoder, TitaNetConfig
    from notsofar_tpu.models.whisper import WHISPER_DIMS, WhisperModel
    from notsofar_tpu.utils.audio import write_wav
    import pandas as pd

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    _t_setup = time.time()

    def _mark(what):
        print(f"[setup +{time.time() - _t_setup:.0f}s] {what}",
              file=sys.stderr, flush=True)

    fs = 16000
    B, secs = args.sessions, args.seconds
    total_audio = B * secs

    # ---- CSS engine (identical to bench.py) ------------------------------
    css_cfg = CssCfg(seg_chunk=32, seg_bucket_multiple=16)
    cdtype = {"float32": jnp.float32,
              "bfloat16": jnp.bfloat16}[css_cfg.compute_dtype]
    cmodel = CssModel(ConformerCssConfig(
        nnet_conf=NnetConfig(conformer_conf=large_conformer_config())),
        dtype=cdtype)
    engine = CssEngine(cmodel, cmodel.init(jax.random.PRNGKey(0)), css_cfg)
    _mark("css model ready")

    # ---- ASR (large-v3 dims, bf16 compute, lockstep batch) ---------------
    dims = WHISPER_DIMS[args.asr_model]
    quant = args.asr_dtype == "int8"
    wmodel = WhisperModel(dims, dtype=jnp.bfloat16, quant_decoder=quant)
    # bf16 weights: same serving configuration real checkpoints load into
    # (f32 large-v3 params alone are ~6 GB of HBM); int8 additionally
    # quantizes the decoder matrices weight-only (decode is bound by
    # weight reads)
    wvars = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        WhisperModel(dims, dtype=jnp.bfloat16).init(jax.random.PRNGKey(1)))
    _mark("whisper params ready")
    if quant:
        from notsofar_tpu.models.whisper import quantize_whisper_decoder
        wvars = quantize_whisper_decoder(wvars)
        _mark("whisper decoder quantized")
    tok = load_tokenizer(args.asr_model, dims.n_vocab)
    # word-timestamp DTW head selection: real checkpoints ship a ~20-pair
    # alignment-heads sidecar (openai whisper large-v3 masks 20 heads; the
    # loader reads <ckpt>.alignment_heads.json) — the serving cost is those
    # heads' maps only. Without this the bench fell into the no-sidecar
    # fallback (ALL 320 top-half head maps), paying ~16x the real
    # z-norm/median-filter work: word_ts measured 2.8-3.3 s/960 s batch
    # under the fallback vs the sidecar-shaped selection here.
    bench_heads = [(l, h) for l in range(dims.n_text_layer - 8,
                                         dims.n_text_layer)
                   for h in (1, dims.n_text_head // 2)][:20]
    common = dict(
        word_timestamps=True,
        alignment_heads=bench_heads,
        hallucination_silence_threshold=None,  # compute-neutral; keeps the
        # random-weight control flow on the nominal full-window path
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
        max_new_tokens=args.decode_steps)
    template = build_template(tok)
    # serving decode config: int8 weights come with int8 cross-KV + the
    # doubled per-dispatch row budget (see TranscribeOptions.cross_kv_quant)
    dec_opts = DecodeOptions(max_new_tokens=args.decode_steps,
                             cross_kv_quant=quant,
                             **({"max_rows_per_dispatch": 48} if quant
                                else {}))
    if args.parity_asr:
        # the reference decode recipe: beam-5, condition_on_previous_text
        # (template tokens feed forward as real prompts), via the
        # batched-prompt scan
        from notsofar_tpu.asr.beam import BeamDecoder
        opts = TranscribeOptions(condition_on_previous_text=True,
                                 batched_prompts=True, beam_size=5,
                                 **common)
        transcriber = WhisperTranscriber(wmodel, wvars, tok, opts)
        transcriber.decoder = BenchDecoder(
            BeamDecoder(wmodel, tok, dec_opts, beam_size=5),
            template)
    else:
        opts = TranscribeOptions(lockstep_decode=True,
                                 condition_on_previous_text=False, **common)
        transcriber = WhisperTranscriber(wmodel, wvars, tok, opts)
        transcriber.decoder = BenchDecoder(
            GreedyDecoder(wmodel, tok, dec_opts),
            template)

    # ---- diarization (TitaNet-large dims, shipped 6 scales) --------------
    encoder = SpeakerEncoder(TitaNetConfig(),   # titanet_large dims
                             compute_dtype=jnp.bfloat16)
    diar_cfg = DiarizationCfg(
        method="word_nmesc",
        min_embedding_windows=[3.0, 2.5, 2.0, 1.5, 1.0, 0.5])

    _mark("titanet + tokenizer ready")
    rng = np.random.RandomState(0)
    mixes = [(rng.randn(1, int(secs * fs), 7) * 0.1).astype(np.float32)
             for _ in range(B)]
    _mark("session audio synthesized")

    tmp = tempfile.mkdtemp(prefix="bench_pipe_")

    import faulthandler
    import threading

    def _watchdog():
        while True:
            time.sleep(120)
            print("--- watchdog stack dump ---", file=sys.stderr, flush=True)
            faulthandler.dump_traceback(file=sys.stderr)

    threading.Thread(target=_watchdog, daemon=True).start()

    # diarization word load: ~2.4 words per SESSION-second, matching
    # natural-meeting speech density (~140 wpm; a 6 min NOTSOFAR meeting
    # carries ~900 GT words). The words distribute across the 3 CSS
    # streams round-robin — separation ROUTES each spoken word to one
    # stream, it does not triple it, so diarization's embed/cluster load
    # scales with the session's spoken words (plus a small cross-stream
    # duplicate rate that dedup removes). Earlier rounds synthesized
    # 2.4 w/s on EVERY stream (7.2/s per session), overstating the
    # diar stage 3x vs the dev-set shape the headline claims. The ASR
    # decode load is NOT reduced correspondingly (fixed 80 steps per
    # window on all 3 streams = full-speech-density streams) — that side
    # stays conservative.
    words_per_sec = 2.4

    # ---- pipelined ingest ------------------------------------------------
    # serving overlaps the next batch's host prep + ~30 MB/s audio upload
    # with the current batch's device work (standard double-buffering);
    # the bench does the same: an ingest thread prepares/uploads batch k+1
    # while batch k runs. run() RECEIVES a future and waits INSIDE the
    # timed css stage, so an ingest slower than the pipeline shows up in
    # the numbers instead of hiding.
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=1)

    def ingest():
        t0 = time.time()
        prep = engine.prepare_sessions(mixes, fs)
        t1 = time.time()
        up = engine.upload_sessions(prep)
        print(f"[ingest] prep {t1 - t0:.1f}s upload {time.time() - t1:.1f}s",
              file=sys.stderr, flush=True)
        return up

    def run_css_asr(tag, up_fut, stage_t, trans=None):
        """CSS + lockstep ASR for one batch; returns the state the diar
        stage needs. Split from run_diar so batch k's diarization (pure
        device work with big host gaps) can run UNDER batch k+1's ASR.
        trans overrides the transcriber (the parity-recipe tail)."""
        trans = trans if trans is not None else transcriber
        t0 = time.time()
        up = up_fut.result() if hasattr(up_fut, "result") else up_fut
        # the ingest wait is LINK time, not device time: report it inside
        # the css stage (wall clock is honest) but also separately, so a
        # slow tunnel's contribution to the css spread is attributable
        # (VERDICT r4: 36% spread at constant FLOPs = link pollution)
        stage_t["ingest_wait"] = time.time() - t0
        # device-resident handoff: the separated int16 streams stay on the
        # chip for ASR mel + diar embedding windows; the host only gets
        # the one copy it needs for the wav-file cache contract
        per_session_wavs, (wav_dev, scales_dev, n_reals) = \
            engine.separate_uploaded_lazy(up)
        stage_t["css"] = time.time() - t0
        print(f"{tag}: css done in {stage_t['css']:.1f}s", file=sys.stderr,
              flush=True)

        # flatten to 3B streams; lockstep ASR across ALL sessions
        t0 = time.time()
        inv = 1.0 / scales_dev
        streams = [wav_dev[b, s, :n_reals[b]].astype(jnp.float32)
                   * inv[b, s]
                   for b in range(B) for s in range(3)]
        results = trans.transcribe_batch(streams)
        stage_t["asr"] = time.time() - t0
        ph = {k: round(v, 2) for k, v in
              trans.last_phase_timer.stage_seconds.items()}
        print(f"{tag}: asr done in {stage_t['asr']:.1f}s {ph}",
              file=sys.stderr, flush=True)
        return dict(tag=tag, results=results,
                    per_session_wavs=per_session_wavs, wav_dev=wav_dev,
                    inv=inv, n_reals=n_reals, stage_t=stage_t)

    def run_diar(state):
        tag = state["tag"]
        stage_t = state["stage_t"]
        results = state["results"]
        per_session_wavs = state["per_session_wavs"]
        wav_dev, inv, n_reals = (state["wav_dev"], state["inv"],
                                 state["n_reals"])
        t0 = time.time()
        # diarization word load: deterministic synthetic timings at the
        # template's word density (a random-weight model's DTW can collapse
        # word times, which would make the diar load run-dependent); the
        # per-word compute is identical to real serving. `results` is only
        # sanity-checked — its DTW cost was paid in the ASR stage above.
        assert all("segments" in r for r in results)
        # wav-file writes are host IO on data the device no longer needs —
        # run them on a thread UNDER the diar batch call (embedding +
        # clustering are pure device work; the files are only read later)
        def _write_all():
            for si in range(B):
                for ci in range(3):
                    write_wav(os.path.join(tmp, f"s{si}_c{ci}.wav"),
                              per_session_wavs[si][ci], fs, max_norm=False)
        writer = threading.Thread(target=_write_all)
        writer.start()
        sessions = []
        for si in range(B):
            wav_files = [os.path.join(tmp, f"s{si}_c{ci}.wav")
                         for ci in range(3)]
            rows = []
            n_words = int(secs * words_per_sec)     # per session, total
            step = secs / n_words
            word_times = np.arange(0.0, secs, step)[:n_words]
            for ci in range(3):
                # stream ci carries every 3rd word (round-robin routing)
                wt_stream = word_times[ci::3]
                for seg_start in np.arange(0.0, secs, 15.0):
                    seg_end = min(seg_start + 15.0, secs)
                    wt = [[" a", round(t, 2), round(min(t + 0.3, secs), 2)]
                          for t in wt_stream
                          if seg_start <= t < seg_end]
                    if not wt:
                        continue
                    rows.append(dict(
                        start_time=seg_start, end_time=seg_end,
                        text=" a" * len(wt), word_timing=wt,
                        meeting_id="MTG_B", session_id=f"mc/MTG_B_{si}",
                        wav_file_name=wav_files[ci]))
            df = pd.DataFrame(rows)
            df["wav_file_name"] = df["wav_file_name"].astype("category")
            df["wav_file_name_ind"] = df["wav_file_name"].cat.codes
            sess_dev = (wav_dev[si, :, :n_reals[si]].astype(jnp.float32)
                        * inv[si][:, None])
            sessions.append(dict(wav_files=wav_files, segments_df=df,
                                 session_wavs=sess_dev, sr=fs))
        t_wav = time.time() - t0
        # one shared embedding pass for ALL sessions (diar batch API)
        labels = word_based_clustering_batch(sessions, diar_cfg,
                                             encoder=encoder)
        writer.join()
        print(f"{tag}: diar prep {t_wav:.2f}s | "
              f"batch-call {time.time() - t0 - t_wav:.2f}s",
              file=sys.stderr, flush=True)
        stage_t["diar"] = time.time() - t0

        # css already contains ingest_wait (it is wall time inside that
        # stage); the serial sum is the three stages only
        wall = stage_t["css"] + stage_t["asr"] + stage_t["diar"]
        n_words = sum(len(w) for out in labels
                      for w in out["word_timing"])
        print(f"{tag}: css {stage_t['css']:.2f}s "
              f"({total_audio / stage_t['css']:.0f}x) | "
              f"asr {stage_t['asr']:.2f}s "
              f"({total_audio / stage_t['asr']:.0f}x) | "
              f"diar {stage_t['diar']:.2f}s "
              f"({total_audio / stage_t['diar']:.0f}x) | "
              f"serial-sum {wall:.2f}s -> {total_audio / wall:.1f}x RT "
              f"[{n_words} diarized words]", file=sys.stderr)
        return total_audio / wall

    def run(tag, up_fut, stage_out=None):
        """One fully serial batch (warmup / --serial mode)."""
        stage_t = stage_out if stage_out is not None else {}
        return run_diar(run_css_asr(tag, up_fut, stage_t))

    def probe_link():
        """16 MB each way: measure the host<->device tunnel IN-RUN so the
        JSON records which bandwidth regime produced the headline (the
        link swings 2-6x between sessions; without this, vs_baseline
        mixes device-bound and link-bound numbers)."""
        x = np.ones((4 * 1024 * 1024,), np.float32)      # 16 MB
        t0 = time.time()
        d = jax.device_put(x)
        d.block_until_ready()
        h2d = 16.0 / max(time.time() - t0, 1e-9)
        t0 = time.time()
        np.asarray(d)
        d2h = 16.0 / max(time.time() - t0, 1e-9)
        print(f"[link probe] h2d {h2d:.0f} MB/s d2h {d2h:.0f} MB/s",
              file=sys.stderr, flush=True)
        return round(h2d, 1), round(d2h, 1)

    t0 = time.time()
    run("warmup", ingest())
    print(f"warmup+compile: {time.time() - t0:.1f}s", file=sys.stderr)
    h2d_mbps, d2h_mbps = probe_link()

    # ingest placement (measured, tools/bench_overlap.py + A/B runs):
    # submit the next batch's ingest at run start — the unthrottled burst
    # drains under the encode/decode phases, whose few long device waits
    # tolerate it best (~4 s absorbed). Bursting under the diar window
    # instead tripled that stage (its many small syncs + the lazy wav
    # download all queue behind the backlog).
    #
    # Round-4 structure (VERDICT r3 items 1c + 3): batches run as a
    # PIPELINE — batch k's diarization (device work with long host gaps)
    # executes on a side thread UNDER batch k+1's CSS/ASR — and the
    # headline is the aggregate audio/wall over ALL pipelined batches
    # (nothing is cherry-picked; no early stop), with every batch's
    # per-stage breakdown reported alongside as `runs`.
    diar_pool = ThreadPoolExecutor(max_workers=1)
    run_stats = []
    fut = pool.submit(ingest)
    diar_fut = None
    t_pipe0 = time.time()
    for i in range(args.repeats):
        transcriber.decoder.rows = transcriber.decoder.chunks = 0
        stage_t0 = dict()
        # prefetch the next batch only if something will consume it — an
        # orphaned ingest otherwise keeps uploading for minutes after the
        # JSON prints (the pool worker blocks interpreter exit)
        last = i == args.repeats - 1
        this_fut, fut = fut, (None if last else pool.submit(ingest))
        state = run_css_asr(f"run{i}", this_fut, stage_t0)
        stage_t0["_dec_rows"] = transcriber.decoder.rows
        stage_t0["_dec_chunks"] = transcriber.decoder.chunks
        if diar_fut is not None:
            diar_fut.result()   # previous batch's diar (ran under our ASR)
        diar_fut = diar_pool.submit(run_diar, state)
        run_stats.append(stage_t0)
    diar_fut.result()
    pipe_wall = time.time() - t_pipe0
    pipeline_rtfx = args.repeats * total_audio / pipe_wall

    serial_rtfx = sorted(total_audio / (s["css"] + s["asr"] + s["diar"])
                         for s in run_stats)
    n = len(serial_rtfx)
    serial_median = (serial_rtfx[n // 2] if n % 2 else
                     0.5 * (serial_rtfx[n // 2 - 1] + serial_rtfx[n // 2]))
    spread = (serial_rtfx[-1] - serial_rtfx[0]) / serial_median \
        if serial_median else 0.0
    # link-corrected estimate: min of each stage across the timed batches
    # — the DEVICE-bound serial throughput a production PCIe host would
    # see (labeled estimate, not the headline). Subtracting ingest_wait
    # alone under-corrects: an overlapped upload still serializes with
    # dispatches on the tunnel (the 645 MB batch upload lands inside
    # whatever stage is running), so per-stage minima are the honest
    # noise floor — identical FLOPs every batch make them comparable.
    min_stage = {k: min(s[k] - (s.get("ingest_wait", 0.0) if k == "css"
                                else 0.0) for s in run_stats)
                 for k in ("css", "asr", "diar")}
    device_median = total_audio / max(
        sum(min_stage.values()), 1e-9)
    print(f"pipeline: {args.repeats} batches in {pipe_wall:.1f}s -> "
          f"{pipeline_rtfx:.1f}x RT aggregate | serial-sum per batch "
          f"median {serial_median:.1f}x spread {100 * spread:.0f}%",
          file=sys.stderr)
    # the MFU accounting below uses the median batch's stage times
    mid = sorted(range(n), key=lambda i: run_stats[i]["css"]
                 + run_stats[i]["asr"] + run_stats[i]["diar"])[n // 2]
    best_stages = run_stats[mid]

    # ---- parity-recipe tail (VERDICT r3 item 2) --------------------------
    # the reference decodes beam-5 + condition_on_previous_text
    # (/root/reference/asr/asr.py:52-56); the headline above is the
    # throughput serving mode. Append ONE batch in the parity mode
    # (warmup for its compiles, then one timed batch) so every bench
    # records the accuracy configuration's number too. Diarization is
    # decode-mode-independent -> the serial estimate reuses the
    # pipelined runs' median diar time.
    parity = None
    if not args.parity_asr and not args.no_parity_tail:
        try:
            from notsofar_tpu.asr.beam import BeamDecoder
            p_opts = TranscribeOptions(condition_on_previous_text=True,
                                       batched_prompts=True, beam_size=5,
                                       **common)
            par = WhisperTranscriber(wmodel, wvars, tok, p_opts)
            par.decoder = BenchDecoder(
                BeamDecoder(wmodel, tok, dec_opts, beam_size=5), template)
            st_w = dict()
            run_css_asr("parity-warmup", pool.submit(ingest), st_w,
                        trans=par)
            st_p = dict()
            run_css_asr("parity", pool.submit(ingest), st_p, trans=par)
            diar_med = float(np.median([s["diar"] for s in run_stats]))
            par_serial = total_audio / (st_p["css"] + st_p["asr"]
                                        + diar_med)
            # device-bound flavor, same basis as serial_device_est: the
            # parity batch's own asr with the pipelined runs' per-stage
            # minima for the decode-mode-independent css/diar stages
            par_dev = total_audio / (min_stage["css"] + st_p["asr"]
                                     + min_stage["diar"])
            parity = {"asr_mode": "beam5_conditioned",
                      "css_s": round(st_p["css"], 2),
                      "asr_s": round(st_p["asr"], 2),
                      "diar_s_median": round(diar_med, 2),
                      "rtfx_serial": round(par_serial, 2),
                      "rtfx_serial_device_est": round(par_dev, 2)}
            print(f"parity tail: css {st_p['css']:.2f}s asr "
                  f"{st_p['asr']:.2f}s (+diar median {diar_med:.2f}s) -> "
                  f"{par_serial:.1f}x RT serial", file=sys.stderr)
        except Exception as e:   # the headline JSON must still print
            parity = {"error": f"{type(e).__name__}: {e}"}
            print(f"parity tail FAILED: {parity['error']}",
                  file=sys.stderr)

    # ---- analytic FLOP / HBM accounting (VERDICT r2 item 6) --------------
    # which resource bounds each stage: achieved FLOP/s vs peak (MFU) and,
    # for the weight-read-bound decode, achieved HBM GB/s.
    from notsofar_tpu.utils import flops as FL
    peaks = FL.device_peaks()
    st = best_stages or {}
    n_win_css = int(np.ceil(secs / 1.5)) * B
    css = FL.StageCost("css", n_win_css * FL.conformer_css_flops(188),
                       st.get("css", 0.0))
    n_win_asr = int(np.ceil(secs / 30.0)) * 3 * B
    steps = args.decode_steps
    beam_rows = 5 if args.parity_asr else 1
    asr_flops = (n_win_asr * FL.whisper_encoder_flops(dims)
                 + st.get("_dec_rows", n_win_asr) * beam_rows * steps
                 * FL.whisper_decode_step_flops(dims, 1)
                 + n_win_asr * FL.whisper_alignment_flops(dims, 128))
    asr_bytes = (st.get("_dec_chunks", 0) * steps
                 * FL.whisper_decode_step_bytes(
                     dims, dtype_bytes=1 if quant else 2))
    asr = FL.StageCost("asr", asr_flops, st.get("asr", 0.0), asr_bytes)
    n_words_total = B * int(secs * words_per_sec)
    scale_frames = [(-(-int((int(np.ceil(s * fs / 8192)) * 8192)
                            / 160 + 1) // 16)) * 16
                    for s in diar_cfg.min_embedding_windows]
    diar_flops = n_words_total * sum(FL.titanet_flops(f)
                                     for f in scale_frames)
    diar = FL.StageCost("diar", diar_flops, st.get("diar", 0.0))
    mfu = {c.name: c.report(peaks) for c in (css, asr, diar)}
    print(f"peaks: {peaks}", file=sys.stderr)
    for c in (css, asr, diar):
        print(f"mfu[{c.name}]: {c.report(peaks)}", file=sys.stderr)

    print(json.dumps({
        "metric": "pipeline_mc_rtfx", "value": round(pipeline_rtfx, 2),
        "unit": "audio_sec/sec/chip", "sessions": B, "seconds": secs,
        "batches": args.repeats,
        "mode": "pipelined",   # diar(k) overlapped under css/asr(k+1);
        # value = SUM of all batches' audio / wall, no run selection
        "runs": [{k: round(v, 2) for k, v in s.items()
                  if not k.startswith("_")} for s in run_stats],
        "serial_median": round(serial_median, 2),
        "serial_spread_pct": round(100 * spread, 1),
        # link instrumentation (VERDICT r4 item 4): the measured tunnel
        # bandwidth this run, and the per-stage-minima serial estimate
        # (the device-bound throughput a local PCIe host sees)
        "h2d_mbps": h2d_mbps, "d2h_mbps": d2h_mbps,
        "serial_device_est": round(device_median, 2),
        "device_est_stage_mins": {k: round(v, 2)
                                  for k, v in min_stage.items()},
        "asr_model": args.asr_model,
        "asr_mode": "beam5_conditioned" if args.parity_asr
        else "lockstep_greedy",
        "asr_weights": args.asr_dtype,
        "parity": parity,
        "mfu": mfu,
        "vs_baseline": round(pipeline_rtfx / 50.0, 3)}))
    # the JSON line above is the bench's entire contract; skip interpreter
    # teardown — releasing ~8 GB of device buffers through the runtime's
    # RPC cleanup measured minutes on a narrow host link, which reads as
    # a hang to any harness with a timeout
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
