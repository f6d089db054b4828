"""Batched Whisper decoding on TPU: greedy + timestamp rules as lax.scan.

The reference relies on openai-whisper's DecodingTask (asr/asr.py:74). Here
decoding is one jitted program: a KV-cached scan over steps with whisper's
logit filters implemented as pure functions of a small carry state:

* suppress-blank at the first sampled position,
* non-speech token suppression,
* timestamp pairing rules (after one timestamp -> only text/eot after a
  pair, only timestamps after text, monotonic timestamps, forced timestamp
  when the total timestamp probability dominates, timestamp-only first
  token),
* eot latching.

Word timestamps use whisper's approach: a second teacher-forced pass
collecting cross-attention from alignment heads. The timing post-
processing (head z-norm, median filter) AND the DTW itself run on device
(_dtw_token_starts: min-plus associative-scan DP + scanned traceback),
batched across streams/windows — only each token's start frame and the
token probabilities are downloaded. A host numpy/C++ DTW (dtw_path)
remains for small offline callers.
"""
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from notsofar_tpu.asr.tokenizer import WhisperTokenizer
from notsofar_tpu.models.whisper import WhisperModel

NEG_INF = -1e30


def detect_language(model: WhisperModel, variables,
                    tokenizer: WhisperTokenizer, xa) -> List[str]:
    """Language identification: the distribution over language tokens at the
    position following <|startoftranscript|> (whisper detect_language; used
    when WhisperAsrCfg.language is None, asr/asr.py:18).

    xa: [B, 1500, D] encoded windows -> list of language codes.
    """
    import numpy as np
    B = xa.shape[0]
    sot = jnp.full((B, 1), tokenizer.sot, jnp.int32)
    logits, _, _ = model.decoder.apply(variables["decoder"], sot, xa, 0, None)
    lang_items = sorted(tokenizer.specials.languages.items(),
                        key=lambda kv: kv[1])
    lang_ids = np.asarray([i for _, i in lang_items])
    lang_logits = logits[:, 0, :][:, lang_ids]          # [B, L]
    best = np.asarray(jnp.argmax(lang_logits, axis=-1))
    codes = [lang_items[int(b)][0] for b in best]
    return codes


def non_speech_tokens(tokenizer: WhisperTokenizer) -> List[int]:
    """Symbols suppressed during decoding (whisper's suppress_tokens='-1'):
    sound annotations, brackets, music symbols etc."""
    symbols = list("\"#()*+/:;<=>@[\\]^_`{|}~「」『』") + \
        ["<<", ">>", "<<<", ">>>", "--", "---", "-(", "-[", "('", "(\"",
         "((", "))", "(((", ")))", "[[", "]]", "{{", "}}", "♪♪", "♪♪♪",
         "♩", "♪", "♫", "♬", "♭", "♮", "♯"]
    ids = set()
    for s in symbols:
        for variant in (s, " " + s):
            toks = tokenizer.encode(variant)
            if len(toks) == 1:
                ids.add(toks[0])
    return sorted(ids)


@dataclass(frozen=True)
class DecodeOptions:
    max_new_tokens: int = 224
    language: str = "en"
    without_timestamps: bool = False
    max_initial_timestamp: float = 1.0
    suppress_blank: bool = True
    suppress_non_speech: bool = True
    temperature: float = 0.0  # >0 -> gumbel sampling (fallback ladder)
    # rows per decode dispatch (beam paths count batch*K): the per-row
    # cross-attention K/V cache is ~0.5 GB on large-v3, so oversized
    # batches spill HBM and run SLOWER than two right-sized dispatches
    max_rows_per_dispatch: int = 12
    # int8 cross-attention K/V (WhisperModel.quantize_cross_kv): decode
    # re-reads the whole cross-KV every step and that traffic scales with
    # the batch — the decode bound on large models. int8 halves it AND
    # lets max_rows_per_dispatch double for the same HBM (fewer weight
    # re-reads). Greedy-argmax parity is tested; pin False for strict
    # bit-parity runs.
    cross_kv_quant: bool = False


class GreedyDecoder:
    """Compiled batched greedy decoder bound to a model + tokenizer."""

    def __init__(self, model: WhisperModel, tokenizer: WhisperTokenizer,
                 options: DecodeOptions = DecodeOptions()):
        self.model = model
        self.tok = tokenizer
        self.opt = options
        d = model.dims
        mask = np.zeros(d.n_vocab, np.float32)
        if options.suppress_non_speech:
            for t in non_speech_tokens(tokenizer):
                mask[t] = NEG_INF
        for t in (tokenizer.specials.translate, tokenizer.specials.transcribe,
                  tokenizer.sot, tokenizer.specials.sot_prev,
                  tokenizer.specials.sot_lm, tokenizer.no_speech):
            if t < d.n_vocab:
                mask[t] = NEG_INF
        for lang_tok in tokenizer.specials.languages.values():
            if lang_tok < d.n_vocab:
                mask[lang_tok] = NEG_INF
        if not options.without_timestamps:
            mask[tokenizer.no_timestamps] = NEG_INF
        self._suppress = mask   # np: lowered without a device round trip
        blank = np.zeros(d.n_vocab, np.float32)
        if options.suppress_blank:
            for t in tokenizer.encode(" ") + [tokenizer.eot]:
                blank[t] = NEG_INF
        self._suppress_blank = blank
        self._ts_begin = tokenizer.timestamp_begin
        self._eot = tokenizer.eot
        self._max_initial_ts = self._ts_begin + int(
            options.max_initial_timestamp / 0.02)

    # ------------------------------------------------------------------
    def _apply_timestamp_rules(self, logits, prev_was_ts, prev_prev_was_ts,
                               last_ts, any_ts, step):
        """whisper ApplyTimestampRules on a [B, V] logits batch.

        Rule set (matching whisper's implementation):
        * after a closing timestamp pair -> timestamps suppressed;
          after an opening timestamp -> text (ids < eot) suppressed;
        * timestamps never decrease: suppress ts < last (open pair allows
          repeating the same value, else strictly greater);
        * first sampled token must be a timestamp <= max_initial_timestamp
          (eot suppressed too);
        * if the summed timestamp probability exceeds the best text token,
          text (everything below timestamp_begin) is suppressed.
        """
        V = logits.shape[-1]
        vocab_ids = jnp.arange(V)
        is_ts = vocab_ids >= self._ts_begin
        below_ts_begin = ~is_ts  # includes eot and text

        only_text = prev_was_ts & prev_prev_was_ts     # just closed a pair
        open_pair = prev_was_ts & (~prev_prev_was_ts)  # must close the pair
        logits = jnp.where(only_text[:, None] & is_ts[None, :], NEG_INF, logits)
        sup_text = (vocab_ids < self._eot)[None, :]
        logits = jnp.where(open_pair[:, None] & sup_text, NEG_INF, logits)

        # monotonicity (only once a timestamp has been emitted)
        threshold = jnp.where(open_pair, last_ts, last_ts + 1)
        below = vocab_ids[None, :] < threshold[:, None]
        logits = jnp.where(any_ts[:, None] & is_ts[None, :] & below,
                           NEG_INF, logits)

        # first sampled token: timestamps only, capped at max_initial_ts
        first = step == 0
        bad_first = below_ts_begin[None, :] | \
            (vocab_ids > self._max_initial_ts)[None, :]
        logits = jnp.where(first & bad_first, NEG_INF, logits)

        # forced timestamp when total ts probability beats best text token
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_lp = jax.scipy.special.logsumexp(
            jnp.where(is_ts[None, :], logprobs, NEG_INF), axis=-1)
        text_lp = jnp.max(jnp.where(is_ts[None, :], NEG_INF, logprobs), axis=-1)
        force_ts = ts_lp > text_lp
        logits = jnp.where(force_ts[:, None] & below_ts_begin[None, :],
                           NEG_INF, logits)
        return logits

    @partial(jax.jit, static_argnums=(0, 3, 6))
    def _decode_scan(self, variables, xa, prompt_len: int, prompt_tokens,
                     rng=None, temperature: float = 0.0, pad_lens=None,
                     row_rngs=None):
        """xa: [B, 1500, D]; prompt_tokens: [B, prompt_len] int32.

        temperature > 0 samples via the gumbel trick (whisper's fallback
        path); temperature == 0 is greedy argmax.
        pad_lens: optional [B] — rows carry per-stream prompts
        RIGHT-ALIGNED in the prompt_len bucket with pad_lens[b] masked
        left-pad slots (batched condition_on_previous_text decoding; the
        sot sequence ends every row, so the state machine and sot position
        are uniform).
        Returns (tokens [B, max_new], sum_logprob [B], length [B],
        no_speech_prob [B])."""
        model, tok = self.model, self.tok
        B = xa.shape[0]
        # size the self-KV cache to what this decode can actually write
        # (prompt + max_new rounded up to 64): every step re-reads the
        # whole cache, so the default 448-wide cache paid ~5x the needed
        # self-attention traffic for short-prompt decodes
        budget = min(self.opt.max_new_tokens,
                     model.dims.n_text_ctx - prompt_len) + prompt_len
        cache_len = min(-(-budget // 64) * 64, model.dims.n_text_ctx)
        caches = model.empty_kv_caches(B, cache_len=cache_len)

        # cross-attention K/V depend only on xa: project once here instead
        # of per step (two [1500, D] x [D, D] matmuls per layer per step
        # otherwise dominate decode FLOPs)
        cross_kvs = model.precompute_cross_kv(variables["decoder"], xa)
        if self.opt.cross_kv_quant:
            cross_kvs = model.quantize_cross_kv(cross_kvs)
        # prefill: run the prompt through the decoder, filling the cache
        logits, caches, _ = model.decoder.apply(
            variables["decoder"], prompt_tokens, xa, 0, caches,
            cross_kvs=cross_kvs, pad_lens=pad_lens)
        # probability of <|nospeech|> measured at the sot position
        sot_pos = prompt_len - 1 - (2 if len(tok.sot_sequence) == 3 else 0)
        sot_logits = logits[:, sot_pos]
        no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, tok.no_speech]
        last_logits = logits[:, -1]

        def step_fn(carry):
            (step, tokens_buf, caches, cur_logits, prev_was_ts,
             prev_prev_was_ts, last_ts, any_ts, sum_lp, length,
             finished) = carry
            lg = cur_logits + self._suppress
            lg = jnp.where(step == 0, lg + self._suppress_blank, lg)
            if not self.opt.without_timestamps:
                lg = self._apply_timestamp_rules(
                    lg, prev_was_ts, prev_prev_was_ts, last_ts, any_ts, step)
            if temperature > 0 and (rng is not None or row_rngs is not None):
                if row_rngs is not None:
                    # per-row keys: row b's draw equals a B=1 decode with
                    # that key (threefry bit-streams are shape-layout
                    # invariant), keeping sampling bit-stable across batch
                    # compositions — the (stream, seek) salting contract
                    g = jax.vmap(lambda kk: jax.random.gumbel(
                        jax.random.fold_in(kk, step),
                        (lg.shape[-1],)))(row_rngs)
                else:
                    g = jax.random.gumbel(jax.random.fold_in(rng, step),
                                          lg.shape)
                next_tok = jnp.argmax(lg / temperature + g, axis=-1
                                      ).astype(jnp.int32)
            else:
                next_tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            # score from the post-filter renormalized distribution, matching
            # whisper (and this repo's beam path) — scoring pre-filter logits
            # would depress avg_logprob on forced-timestamp/suppressed steps
            # and trigger spurious temperature fallbacks
            lp = jax.nn.log_softmax(lg, axis=-1)
            tok_lp = jnp.take_along_axis(lp, next_tok[:, None], 1)[:, 0]
            next_tok = jnp.where(finished, self._eot, next_tok)
            is_eot = next_tok == self._eot
            sum_lp = sum_lp + jnp.where(finished, 0.0, tok_lp)
            length = length + jnp.where(finished | is_eot, 0, 1)
            new_finished = finished | is_eot

            is_ts = (next_tok >= self._ts_begin) & ~new_finished
            new_last_ts = jnp.where(is_ts, next_tok, last_ts)
            new_any_ts = any_ts | is_ts
            tokens_buf = jax.lax.dynamic_update_slice_in_dim(
                tokens_buf, next_tok[:, None], step, axis=1)
            new_logits, new_caches, _ = model.decoder.apply(
                variables["decoder"], next_tok[:, None], xa,
                prompt_len + step, caches, cross_kvs=cross_kvs,
                pad_lens=pad_lens)
            return (step + 1, tokens_buf, new_caches, new_logits[:, 0],
                    is_ts, prev_was_ts, new_last_ts, new_any_ts, sum_lp,
                    length, new_finished)

        # never run the cache past n_text_ctx (a 227-token prompt plus 224
        # new tokens would otherwise clamp updates into the last slot)
        max_new = min(self.opt.max_new_tokens,
                      model.dims.n_text_ctx - prompt_len)

        def cond_fn(carry):
            step, finished = carry[0], carry[-1]
            # early exit once every sequence latched EOT — long-form windows
            # rarely use the full token budget
            return (step < max_new) & ~jnp.all(finished)

        init = (jnp.zeros((), jnp.int32),
                jnp.full((B, max_new), self._eot, jnp.int32),
                caches, last_logits,
                jnp.zeros(B, bool), jnp.zeros(B, bool),
                jnp.full(B, self._ts_begin, jnp.int32), jnp.zeros(B, bool),
                jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
                jnp.zeros(B, bool))
        carry = jax.lax.while_loop(cond_fn, step_fn, init)
        tokens_buf, sum_lp, length = carry[1], carry[8], carry[9]
        # pack the float outputs into ONE buffer: each host read of a
        # separate device array is a full round trip on the tunnel
        stats = jnp.stack([sum_lp, length.astype(jnp.float32),
                           no_speech_prob], axis=1)       # [B, 3]
        return tokens_buf, stats

    # ------------------------------------------------------------------
    def decode(self, variables, xa: jnp.ndarray,
               prompt: Optional[Sequence[int]] = None,
               temperature: float = 0.0,
               rng=None) -> Dict:
        """Greedy (or temperature-sampled) decode of a batch of windows.

        prompt: optional previous-context token ids (prepended with
        sot_prev per whisper's condition_on_previous_text).
        Returns dict of numpy arrays: tokens, avg_logprob, no_speech_prob.
        """
        tok = self.tok
        prefix = list(prompt) if prompt else []
        if prefix:
            prefix = [tok.specials.sot_prev] + prefix[-(self.model.dims.n_text_ctx // 2 - 1):]
        initial = prefix + tok.sot_sequence
        B = xa.shape[0]
        if temperature > 0 and rng is None:
            rng = jax.random.PRNGKey(0)
        cap = max(self.opt.max_rows_per_dispatch, 1)
        outs = []
        for c0 in range(0, B, cap):
            xa_c = xa[c0:c0 + cap]
            n = xa_c.shape[0]
            if B > cap and n < cap:     # pad the tail chunk to the
                # dispatch shape (one compile per cap, not per remainder)
                xa_c = jnp.concatenate(
                    [xa_c, jnp.repeat(xa_c[:1], cap - n, axis=0)])
            prompt_tokens = jnp.asarray(
                np.tile(np.asarray(initial, np.int32),
                        (xa_c.shape[0], 1)))
            t, s = self._decode_scan(
                variables, xa_c, len(initial), prompt_tokens, rng,
                float(temperature))
            outs.append((np.asarray(t)[:n], np.asarray(s)[:n]))
        tokens = np.concatenate([t for t, _ in outs])
        stats = np.concatenate([s for _, s in outs])
        return self._unpack_decode(tokens, stats)

    def _unpack_decode(self, tokens: np.ndarray, stats: np.ndarray) -> Dict:
        sum_lp, length, nsp = stats[:, 0], stats[:, 1], stats[:, 2]
        avg_lp = sum_lp / np.maximum(length + 1, 1)
        out_tokens = []
        for b in range(tokens.shape[0]):
            t = tokens[b]
            end = np.argmax(t == self._eot) if (t == self._eot).any() else len(t)
            out_tokens.append(t[:end].tolist())
        return dict(tokens=out_tokens, avg_logprob=avg_lp,
                    no_speech_prob=nsp)

    def _pack_prompts(self, prompts: Sequence[Optional[Sequence[int]]]
                      ) -> Tuple[np.ndarray, np.ndarray, int]:
        """Right-align per-row prompt prefixes in a power-of-two bucket.
        Returns (tokens [B, P_pad], pad_lens [B], P_pad)."""
        tok = self.tok
        prefixes = []
        for pr in prompts:
            pre = list(pr) if pr else []
            if pre:
                pre = [tok.specials.sot_prev] + \
                    pre[-(self.model.dims.n_text_ctx // 2 - 1):]
            prefixes.append(pre + tok.sot_sequence)
        P = max(len(p) for p in prefixes)
        P_pad = 1 << max(2, (P - 1).bit_length())
        toks = np.full((len(prefixes), P_pad), tok.sot, np.int32)
        pads = np.zeros(len(prefixes), np.int32)
        for b, p in enumerate(prefixes):
            toks[b, P_pad - len(p):] = p
            pads[b] = P_pad - len(p)
        return toks, pads, P_pad

    def decode_prompted(self, variables, xa: jnp.ndarray,
                        prompts: Sequence[Optional[Sequence[int]]],
                        temperature: float = 0.0, rng=None,
                        rngs=None) -> Dict:
        """Batched decode with a DIFFERENT prompt per row
        (condition_on_previous_text across streams): prompts are
        right-aligned in a power-of-two bucket with masked left-pad, so
        the whole batch runs as one scan — the reference semantics without
        the per-stream serial decode chains. Batches larger than
        max_rows_per_dispatch split into chunks (HBM: ~0.5 GB cross-KV
        per row on large models).

        Same contract as decode(); bit-identical to per-row decode() at
        temperature 0 (tested). rngs: optional per-row PRNG keys — row b
        samples exactly as a B=1 decode with rngs[b], preserving the
        per-(stream, seek) sampling-salt contract across batch
        compositions (tested); rng: one key for the whole batch."""
        B = xa.shape[0]
        cap = max(self.opt.max_rows_per_dispatch, 1)
        if B > cap:
            outs = []
            for c0 in range(0, B, cap):
                sub_rngs = list(rngs)[c0:c0 + cap] if rngs is not None \
                    else None
                outs.append(self.decode_prompted(
                    variables, xa[c0:c0 + cap],
                    list(prompts)[c0:c0 + cap], temperature, rng,
                    sub_rngs))
            return dict(
                tokens=[t for o in outs for t in o["tokens"]],
                avg_logprob=np.concatenate(
                    [o["avg_logprob"] for o in outs]),
                no_speech_prob=np.concatenate(
                    [o["no_speech_prob"] for o in outs]))
        toks, pads, P_pad = self._pack_prompts(prompts)
        assert toks.shape[0] == B
        row_rngs = jnp.stack(list(rngs)) if rngs is not None else None
        if temperature > 0 and rng is None and row_rngs is None:
            rng = jax.random.PRNGKey(0)
        tokens, stats = self._decode_scan(
            variables, xa, P_pad, jnp.asarray(toks), rng,
            float(temperature), pad_lens=jnp.asarray(pads),
            row_rngs=row_rngs)
        return self._unpack_decode(np.asarray(tokens), np.asarray(stats))


# --------------------------------------------------------------------------
# word-level timestamps (teacher-forced cross-attention + DTW)
# --------------------------------------------------------------------------

def median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis with edge padding."""
    if width <= 1 or x.shape[-1] == 0:
        return x
    pad = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(win, axis=-1)


_DTW_LIB = None
_DTW_TRIED = False


def _load_dtw_native():
    """ctypes-load native/libdtw.so, building it with make on first use
    (same pattern as the tclev scorer kernel); None -> numpy fallback."""
    global _DTW_LIB, _DTW_TRIED
    if _DTW_TRIED:
        return _DTW_LIB
    _DTW_TRIED = True
    import ctypes
    import os
    import subprocess
    native_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")
    so_path = os.path.join(native_dir, "libdtw.so")
    try:
        subprocess.run(["make", "-C", native_dir, "libdtw.so"], check=True,
                       capture_output=True)
    except Exception:
        if not os.path.exists(so_path):
            return None
    try:
        lib = ctypes.CDLL(so_path)
        lib.dtw_path.restype = ctypes.c_int64
        lib.dtw_path.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        _DTW_LIB = lib
    except OSError:
        _DTW_LIB = None
    return _DTW_LIB


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW over cost [N, M]; returns the alignment path.

    Native C++ kernel (native/dtw.cpp) when buildable — the interpreted DP
    below is ~0.5 s per 30 s window on a single-core host, which dominated
    the ASR stage; the kernel is ~1 ms with identical tie-breaking."""
    N, M = cost.shape
    lib = _load_dtw_native()
    if lib is not None and N > 0 and M > 0:
        import ctypes
        c = np.ascontiguousarray(cost, np.float32)
        ti = np.empty(N + M, np.int32)
        tj = np.empty(N + M, np.int32)
        n = lib.dtw_path(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), N, M,
            ti.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tj.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return ti[:n].astype(np.int64), tj[:n].astype(np.int64)
    return _dtw_path_numpy(cost)


def _dtw_path_numpy(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Reference numpy DP (fallback when g++ is unavailable)."""
    N, M = cost.shape
    D = np.full((N + 1, M + 1), np.inf)
    D[0, 0] = 0
    trace = np.zeros((N + 1, M + 1), np.int8)
    for i in range(1, N + 1):
        row_prev = D[i - 1]
        row = D[i]
        for j in range(1, M + 1):
            c0, c1, c2 = D[i - 1, j - 1], row_prev[j], row[j - 1]
            if c0 <= c1 and c0 <= c2:
                D[i, j] = cost[i - 1, j - 1] + c0
                trace[i, j] = 0
            elif c1 < c2:
                D[i, j] = cost[i - 1, j - 1] + c1
                trace[i, j] = 1
            else:
                D[i, j] = cost[i - 1, j - 1] + c2
                trace[i, j] = 2
    i, j = N, M
    text_idx, time_idx = [], []
    while i > 0 and j > 0:
        text_idx.append(i - 1)
        time_idx.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.array(text_idx[::-1]), np.array(time_idx[::-1])


def decode_alignment_heads(blob: str, n_text_layer: int,
                           n_text_head: int) -> List[Tuple[int, int]]:
    """Decode whisper's compact alignment-heads mask.

    The whisper pip package the reference uses ships a per-model base85-
    encoded gzipped [n_text_layer, n_text_head] boolean mask selecting the
    cross-attention heads whose maps are reliable for DTW word alignment.
    Returns the selected (layer, head) pairs.
    """
    import base64
    import gzip
    arr = np.frombuffer(gzip.decompress(base64.b85decode(blob)),
                        dtype=bool).copy()
    arr = arr.reshape(n_text_layer, n_text_head)
    ls, hs = np.nonzero(arr)
    return list(zip(ls.tolist(), hs.tolist()))


def encode_alignment_heads(pairs: List[Tuple[int, int]], n_text_layer: int,
                           n_text_head: int) -> str:
    """Inverse of decode_alignment_heads (for tests / sidecar authoring)."""
    import base64
    import gzip
    arr = np.zeros((n_text_layer, n_text_head), bool)
    for l, h in pairs:
        arr[l, h] = True
    return base64.b85encode(gzip.compress(arr.tobytes())).decode()


PREPEND_PUNCTUATIONS = "\"'“¿([{-"
APPEND_PUNCTUATIONS = "\"'.。,，!！?？:：”)]}、"


def merge_punctuations(words: List[Dict],
                       prepended: str = PREPEND_PUNCTUATIONS,
                       appended: str = APPEND_PUNCTUATIONS) -> List[Dict]:
    """Fold standalone punctuation 'words' into their neighbors.

    Same semantics as the whisper pip package the reference transcribes
    with (asr/asr.py:60-68; word_timestamps=True path): a leading-space
    punctuation mark merges into the FOLLOWING word (keeping the
    follower's times), a bare punctuation mark merges into the PRECEDING
    word (keeping that word's times). Without this, '.'/',' tokens carry
    their own word_timing rows into diarization.
    """
    ws = [dict(w) for w in words]

    def _absorb(dst, src):
        # token accounting follows whisper's timing.merge_punctuations: the
        # absorbing word inherits the punctuation's tokens (the emptied
        # entry keeps tokens=[] and is skipped by distribution)
        dst["n_tokens"] = dst.get("n_tokens", 1) + src.get("n_tokens", 1)
        src["n_tokens"] = 0

    # prepended punctuation: scan backwards
    i, j = len(ws) - 2, len(ws) - 1
    while i >= 0:
        prev, foll = ws[i], ws[j]
        if prev["word"].startswith(" ") and prev["word"].strip() in prepended:
            foll["word"] = prev["word"] + foll["word"]
            _absorb(foll, prev)
            prev["word"] = ""
        else:
            j = i
        i -= 1
    # appended punctuation: scan forwards
    i, j = 0, 1
    while j < len(ws):
        prev, foll = ws[i], ws[j]
        if not prev["word"].endswith(" ") and foll["word"] in appended:
            prev["word"] = prev["word"] + foll["word"]
            _absorb(prev, foll)
            foll["word"] = ""
        else:
            i = j
        j += 1
    return [w for w in ws if w["word"]]


_TF_JIT_CACHE: dict = {}


def _median7_network(w: list):
    """Median of 7 same-shaped arrays by odd-even transposition (7 passes
    of pairwise min/max, then the middle lane). A general sort lowers to
    an expensive bitonic network on the VPU; this is a fixed 21-exchange
    network — exhaustively verified over all 5040 permutations."""
    w = list(w)

    def cas(i, j):
        lo = jnp.minimum(w[i], w[j])
        hi = jnp.maximum(w[i], w[j])
        w[i], w[j] = lo, hi

    for p in range(7):
        for i in (0, 2, 4) if p % 2 == 0 else (1, 3, 5):
            cas(i, i + 1)
    return w[3]


_DTW_BIG = 1.0e30


def _dtw_token_starts(neg_cost, n_rows, n_cols):
    """Monotonic DTW fully ON DEVICE: forward DP via a min-plus
    associative scan per row, then a scanned traceback — returns each
    token row's FIRST path frame (the only DTW output word timing needs),
    so nothing but a [B, T] vector leaves the device (the [T, 1500] cost
    matrices are ~1.5 MB per window; downloading them dominated the
    word-timestamp stage over a narrow device link).

    neg_cost: [B, T, F] (already negated attention matrix); n_rows/n_cols:
    [B] valid extents (padding columns are masked with a huge cost, which
    cannot affect D at real cells — the DP is forward-only).

    The row recurrence D[i,j] = c[j] + min(D[i-1,j-1], D[i-1,j], D[i,j-1])
    splits into a_j = min(D[i-1,j-1], D[i-1,j]) and the first-order
    min-plus recurrence x_j = min(a_j + c_j, x_{j-1} + c_j), which is an
    associative scan over pairs (c, b). Traceback recomputes the numpy
    reference's tie order (diagonal <= up < left) from D; f32 vs the
    host float64 DP can flip razor-tie decisions — sub-frame (20 ms)
    jitter, covered by the differential test.

    Returns tstart [B, T] float32 frame indices (F for never-visited /
    padded rows)."""
    B, T, F = neg_cost.shape
    col = jnp.arange(F)
    cost = jnp.where(col[None, None, :] >= n_cols[:, None, None],
                     _DTW_BIG, neg_cost)

    def row_step(D_prev, cost_row):
        # D_prev [B, F+1]; cost_row [B, F]
        a = jnp.minimum(D_prev[:, :-1], D_prev[:, 1:])
        b = a + cost_row

        def comb(l, r):
            return (l[0] + r[0], jnp.minimum(l[1] + r[0], r[1]))

        _, x = jax.lax.associative_scan(comb, (cost_row, b), axis=1)
        D_row = jnp.concatenate(
            [jnp.full((B, 1), _DTW_BIG, cost.dtype), x], axis=1)
        return D_row, D_row

    D0 = jnp.concatenate([jnp.zeros((B, 1), cost.dtype),
                          jnp.full((B, F), _DTW_BIG, cost.dtype)], axis=1)
    _, D_rows = jax.lax.scan(row_step, D0, jnp.moveaxis(cost, 1, 0))
    D = jnp.concatenate([D0[None], D_rows], axis=0)     # [T+1, B, F+1]
    D = jnp.moveaxis(D, 1, 0)                           # [B, T+1, F+1]

    def traceback(Db, i0, j0):
        def step(state, _):
            i, j, tstart = state
            active = (i > 0) & (j > 0)
            c0 = Db[i - 1, j - 1]
            c1 = Db[i - 1, j]
            c2 = Db[i, j - 1]
            tstart = jax.lax.cond(
                active,
                lambda ts: ts.at[i - 1].min(jnp.float32(j - 1)),
                lambda ts: ts, tstart)
            diag = (c0 <= c1) & (c0 <= c2)
            up = (~diag) & (c1 < c2)
            di = jnp.where(diag | up, 1, 0)
            dj = jnp.where(diag | (~diag & ~up), 1, 0)
            i = jnp.where(active, i - di, i)
            j = jnp.where(active, j - dj, j)
            return (i, j, tstart), None

        init = (i0, j0, jnp.full((T,), jnp.float32(F)))
        (_, _, tstart), _ = jax.lax.scan(step, init, None, length=T + F)
        return tstart

    return jax.vmap(traceback)(D, n_rows, n_cols)


def _alignment_jit(model, heads_key, eot: int, sot_len: int):
    """Cached jitted BATCHED teacher-forced alignment pass.

    Runs the decoder teacher-forced AND the whisper timing post-processing
    (head selection, per-frame z-norm over the real token rows, width-7
    median filter per head, head mean) plus the per-token probability
    gather ON DEVICE — transferring raw cross-attention to the host would
    move ~0.5 GB per 30 s window on large models; the reduced outputs are
    ~1.5 MB/window. The median filter sees the full 1500-frame width
    (whisper slices to the content extent first); for full windows this is
    identical, for a stream's final partial window it can shift values
    within 3 frames of the content cut — sub-timestamp-resolution.

    The no-sidecar default selects ALL heads of the top half of the layers
    (whisper's own fallback) — that is ~320 head-maps on large-v3, so the
    per-head pipeline accumulates LAYER BY LAYER (exact: z-norm and median
    are per-head, the final matrix is a plain head-mean), keeping peak
    memory at one layer's attention instead of the full stack.

    The DTW itself ALSO runs on device (_dtw_token_starts) — only each
    token's start frame and the token probabilities are downloaded.
    Returns (token_starts [B, L - sot_len - 1], next_token_probs
    [B, L-1])."""
    key = (id(model), heads_key, eot, sot_len)
    fn = _TF_JIT_CACHE.get(key)
    if fn is None:
        import jax
        kind, sel = heads_key

        def median7(x):  # [..., F] -> width-7 median along F, edge padded
            pad = [(0, 0)] * (x.ndim - 1) + [(3, 3)]
            xp = jnp.pad(x, pad, mode="edge")
            win = [xp[..., k:k + x.shape[-1]] for k in range(7)]
            return _median7_network(win)

        def znorm_median(w, n_real):
            # w: [B, H, T, F]; z-norm per (head, frame) over real token
            # rows, then median-filter along frames; -> sum over heads
            mask = (jnp.arange(w.shape[-2])[None, :] <
                    n_real[:, None])[:, None, :, None]
            cnt = jnp.maximum(n_real, 1).astype(jnp.float32)[
                :, None, None, None]
            mean = jnp.sum(jnp.where(mask, w, 0.0), -2, keepdims=True) / cnt
            var = jnp.sum(jnp.where(mask, (w - mean) ** 2, 0.0), -2,
                          keepdims=True) / cnt
            wn = (w - mean) / (jnp.sqrt(var) + 1e-9)
            return median7(wn).sum(axis=1)              # [B, T, F]

        def run(variables, toks, xa, n_real, n_cols):
            # toks [B, L], xa [B, 1500, D], n_real/n_cols [B]
            logits, _, cross = model.decoder.apply(
                variables["decoder"], toks, xa, 0, None,
                return_cross_attn=True)
            if kind == "heads":
                per_layer = {}
                for l, h in sel:
                    per_layer.setdefault(l, []).append(h)
                acc = 0.0
                for l, hs in per_layer.items():
                    acc = acc + znorm_median(
                        cross[l][:, jnp.asarray(hs)], n_real)
                matrix = acc / len(sel)
            else:
                acc = 0.0
                n_heads = 0
                for i in sel:
                    acc = acc + znorm_median(cross[i], n_real)
                    n_heads += cross[i].shape[1]
                matrix = acc / n_heads                   # [B, T, F]
            probs = jax.nn.softmax(logits[..., :eot], axis=-1)
            nxt = jnp.clip(toks[:, 1:], 0, eot - 1)
            tok_probs = jnp.take_along_axis(probs[:, :-1], nxt[..., None],
                                            2)[..., 0]
            # DTW on device: rows = the text-token slice of the matrix
            rows = matrix[:, sot_len:-1]
            tstart = _dtw_token_starts(-rows, n_real - sot_len - 1, n_cols)
            return tstart, tok_probs

        fn = jax.jit(run)
        _TF_JIT_CACHE[key] = fn
    return fn


def find_word_timestamps(model: WhisperModel, variables,
                         tokenizer: WhisperTokenizer,
                         xa_single: jnp.ndarray,
                         text_tokens: List[int],
                         num_frames: int,
                         time_offset: float = 0.0,
                         alignment_layers: Optional[List[int]] = None,
                         alignment_heads: Optional[List[Tuple[int, int]]]
                         = None, merge: bool = True) -> List[Dict]:
    """Teacher-forced pass + DTW ->
    [{'word','start','end','probability','n_tokens'} ...].

    merge=False returns the raw per-word alignment (whisper's
    find_alignment), letting the caller run the duration-truncation hacks
    BEFORE merge_punctuations exactly like whisper's add_word_timestamps.

    xa_single: [1, 1500, D] for one window; text_tokens: decoded tokens
    (without sot/eot); num_frames: valid mel frames (content length / 2).
    alignment_heads: optional per-model (layer, head) selection (whisper
    ships one per checkpoint; see decode_alignment_heads). When absent,
    all heads of the last half of the layers are used (whisper's own
    default for models without a mask).
    """
    return find_word_timestamps_batch(
        model, variables, tokenizer, [xa_single], [text_tokens],
        [num_frames], [time_offset], alignment_layers=alignment_layers,
        alignment_heads=alignment_heads, merge=merge)[0]


# sub-batch cap for the all-heads (no-sidecar) path: one layer's attention
# is [B, n_head, L, 1500] f32, live a few layers deep during accumulation
# (~370 MB per layer at B=12 on large-v3 — a few layers in flight fits)
_ALIGN_MAX_BS_LAYERS = 12
_ALIGN_MAX_BS_HEADS = 24


def find_word_timestamps_batch(model: WhisperModel, variables,
                               tokenizer: WhisperTokenizer,
                               xa_list: List[jnp.ndarray],
                               text_tokens_list: List[List[int]],
                               num_frames_list: List[int],
                               time_offsets: Optional[List[float]] = None,
                               alignment_layers: Optional[List[int]] = None,
                               alignment_heads: Optional[List[Tuple[int, int]]]
                               = None, merge: bool = True
                               ) -> List[List[Dict]]:
    """Batched find_word_timestamps over many (window, tokens) pairs.

    The lockstep transcriber calls this once per iteration for every active
    stream: one teacher-forced dispatch per token-length bucket instead of
    one per stream — per-dispatch latency over a device tunnel dominated
    the word-timestamp stage otherwise. Items are bucketed by padded token
    length (eot-padding; causality keeps real prefix rows bit-identical)
    and chunked to bound cross-attention memory."""
    d = model.dims
    if alignment_heads:
        alignment_layers = sorted({l for l, _ in alignment_heads})
    elif alignment_layers is None:
        alignment_layers = list(range(d.n_text_layer // 2, d.n_text_layer))
    if time_offsets is None:
        time_offsets = [0.0] * len(xa_list)
    heads_key = (("heads", tuple((int(l), int(h))
                                 for l, h in alignment_heads))
                 if alignment_heads else
                 ("layers", tuple(int(i) for i in alignment_layers)))
    max_bs = _ALIGN_MAX_BS_HEADS if alignment_heads else \
        _ALIGN_MAX_BS_LAYERS
    sot_len = len(tokenizer.sot_sequence) + 1
    fn = _alignment_jit(model, heads_key, int(tokenizer.eot), sot_len)

    items = []
    for i, text_tokens in enumerate(text_tokens_list):
        full = tokenizer.sot_sequence + [tokenizer.no_timestamps] + \
            list(text_tokens) + [tokenizer.eot]
        L = len(full)
        pad_to = min(max(32, 1 << (L - 1).bit_length()), d.n_text_ctx)
        assert L <= pad_to, f"{L} tokens exceed the decoder context"
        items.append((pad_to, i, full, L))

    results: List[Optional[List[Dict]]] = [None] * len(xa_list)
    buckets: Dict[int, list] = {}
    for it in items:
        buckets.setdefault(it[0], []).append(it)
    for pad_to, bucket in sorted(buckets.items()):
        for c0 in range(0, len(bucket), max_bs):
            chunk = bucket[c0:c0 + max_bs]
            B = len(chunk)
            toks = np.full((B, pad_to), tokenizer.eot, np.int32)
            n_real = np.zeros(B, np.int32)
            n_cols = np.zeros(B, np.int32)
            for j, (_, i, full, L) in enumerate(chunk):
                toks[j, :L] = full
                n_real[j] = L
                n_cols[j] = num_frames_list[i] // 2
            xa = jnp.concatenate([xa_list[i] for _, i, _, _ in chunk],
                                 axis=0)
            tstarts, probs = fn(variables, jnp.asarray(toks), xa,
                                jnp.asarray(n_real), jnp.asarray(n_cols))
            tstarts = np.asarray(tstarts)
            probs = np.asarray(probs)
            for j, (_, i, full, L) in enumerate(chunk):
                n_text = len(text_tokens_list[i])
                results[i] = _finish_word_timestamps(
                    tstarts[j, :n_text], probs[j], tokenizer,
                    text_tokens_list[i], num_frames_list[i],
                    time_offsets[i], merge)
    return results


def _finish_word_timestamps(tstart: np.ndarray, tok_probs: np.ndarray,
                            tokenizer: WhisperTokenizer,
                            text_tokens: List[int], num_frames: int,
                            time_offset: float, merge: bool) -> List[Dict]:
    """Host tail of the alignment: token start frames -> word dicts.

    tstart: [n_text] each token row's first DTW path frame (device DTW);
    tok_probs: next-token probabilities under the text-vocab-restricted
    softmax (whisper timing.find_alignment), used for word probability =
    mean over its tokens — feeds the hallucination anomaly score."""
    n_text = len(text_tokens)
    sot_len = len(tokenizer.sot_sequence) + 1
    text_token_probs = tok_probs[sot_len - 1:sot_len - 1 + n_text]
    if n_text == 0 or num_frames // 2 == 0:
        return []

    words, word_tokens = tokenizer.split_to_word_tokens(list(text_tokens))
    if not words:
        return []
    # first path time for each token row (the 'jump' into that row), plus a
    # sentinel end time at the window's valid extent
    n_tok = n_text
    token_start = np.full(n_tok + 1, (num_frames // 2) * 0.02)
    token_start[:n_tok] = np.minimum(tstart, num_frames // 2) * 0.02
    # monotonic fill
    token_start = np.maximum.accumulate(token_start)
    out = []
    pos = 0
    for word, wt in zip(words, word_tokens):
        start = token_start[min(pos, n_tok)]
        end = token_start[min(pos + len(wt), n_tok)]
        prob = float(np.mean(text_token_probs[pos:pos + len(wt)])) \
            if len(wt) and pos + len(wt) <= n_text else 0.0
        out.append(dict(word=word, start=time_offset + float(start),
                        end=time_offset + float(max(end, start)),
                        probability=prob, n_tokens=len(wt)))
        pos += len(wt)
    if merge:
        return merge_punctuations(out)
    return out
