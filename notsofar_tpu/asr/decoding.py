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
collecting cross-attention from alignment heads, then DTW on the host
(dtw/median-filter in numpy — tiny matrices).
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
    lang_ids = jnp.asarray([i for _, i in lang_items])
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
        self._suppress = jnp.asarray(mask)
        blank = np.zeros(d.n_vocab, np.float32)
        if options.suppress_blank:
            for t in tokenizer.encode(" ") + [tokenizer.eot]:
                blank[t] = NEG_INF
        self._suppress_blank = jnp.asarray(blank)
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
                     rng=None, temperature: float = 0.0):
        """xa: [B, 1500, D]; prompt_tokens: [B, prompt_len] int32.

        temperature > 0 samples via the gumbel trick (whisper's fallback
        path); temperature == 0 is greedy argmax.
        Returns (tokens [B, max_new], sum_logprob [B], length [B],
        no_speech_prob [B])."""
        model, tok = self.model, self.tok
        B = xa.shape[0]
        caches = model.empty_kv_caches(B)

        # prefill: run the prompt through the decoder, filling the cache
        logits, caches, _ = model.decoder.apply(
            variables["decoder"], prompt_tokens, xa, 0, caches)
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
            if temperature > 0 and rng is not None:
                g = jax.random.gumbel(jax.random.fold_in(rng, step), lg.shape)
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
                prompt_len + step, caches)
            return (step + 1, tokens_buf, new_caches, new_logits[:, 0],
                    is_ts, prev_was_ts, new_last_ts, new_any_ts, sum_lp,
                    length, new_finished)

        max_new = self.opt.max_new_tokens

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
        return tokens_buf, sum_lp, length, no_speech_prob

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
        prompt_tokens = jnp.asarray(
            np.tile(np.asarray(initial, np.int32), (B, 1)))
        if temperature > 0 and rng is None:
            rng = jax.random.PRNGKey(0)
        tokens, sum_lp, length, nsp = self._decode_scan(
            variables, xa, len(initial), prompt_tokens, rng,
            float(temperature))
        tokens = np.asarray(tokens)
        sum_lp = np.asarray(sum_lp)
        length = np.asarray(length)
        avg_lp = sum_lp / np.maximum(length + 1, 1)
        out_tokens = []
        for b in range(B):
            t = tokens[b]
            end = np.argmax(t == self._eot) if (t == self._eot).any() else len(t)
            out_tokens.append(t[:end].tolist())
        return dict(tokens=out_tokens, avg_logprob=avg_lp,
                    no_speech_prob=np.asarray(nsp))


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


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW over cost [N, M]; returns the alignment path."""
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
    d = model.dims
    if alignment_heads:
        alignment_layers = sorted({l for l, _ in alignment_heads})
    elif alignment_layers is None:
        alignment_layers = list(range(d.n_text_layer // 2, d.n_text_layer))
    full = tokenizer.sot_sequence + [tokenizer.no_timestamps] + \
        list(text_tokens) + [tokenizer.eot]
    toks = jnp.asarray(np.asarray(full, np.int32)[None])
    logits, _, cross = model.decoder.apply(
        variables["decoder"], toks, xa_single, 0, None,
        return_cross_attn=True)
    # per-token probabilities under the text-vocab-restricted softmax
    # (whisper timing.find_alignment: logits[..., :eot].softmax), used for
    # word probability = mean over its tokens — feeds the hallucination
    # anomaly score in transcribe.py.
    n_text = len(text_tokens)
    sot_len_ = len(tokenizer.sot_sequence) + 1
    if n_text:
        lg = np.asarray(logits[0, sot_len_ - 1:sot_len_ - 1 + n_text,
                               :tokenizer.eot], np.float32)
        lg = lg - lg.max(axis=-1, keepdims=True)
        probs_all = np.exp(lg)
        probs_all /= probs_all.sum(axis=-1, keepdims=True)
        text_token_probs = probs_all[np.arange(n_text),
                                     np.asarray(text_tokens)]
    else:
        text_token_probs = np.zeros(0, np.float32)
    # stack selected heads (or whole layers): cross[i] is [1, H, T, 1500]
    if alignment_heads:
        w = np.stack([np.asarray(cross[l])[0, h]
                      for l, h in alignment_heads])
    else:
        w = np.concatenate([np.asarray(cross[i])
                            for i in alignment_layers], axis=1)[0]
    w = w[:, :, : num_frames // 2]          # [H*, T, frames]
    # normalize across time like whisper: softmax already applied; z-norm
    std = w.std(axis=-2, keepdims=True) + 1e-9
    mean = w.mean(axis=-2, keepdims=True)
    w = (w - mean) / std
    w = median_filter(w, 7)
    matrix = w.mean(axis=0)                  # [T, frames]
    sot_len = len(tokenizer.sot_sequence) + 1
    matrix = matrix[sot_len:-1]              # text tokens + eot? exclude eot
    if matrix.shape[0] == 0 or matrix.shape[1] == 0:
        return []
    text_idx, time_idx = dtw_path(-matrix)

    words, word_tokens = tokenizer.split_to_word_tokens(list(text_tokens))
    if not words:
        return []
    # first path time for each token row (the 'jump' into that row), plus a
    # sentinel end time at the window's valid extent
    n_tok = matrix.shape[0]
    token_start = np.full(n_tok + 1, (num_frames // 2) * 0.02)
    seen = np.zeros(n_tok + 1, bool)
    for ti_, tj in zip(text_idx, time_idx):
        if not seen[ti_]:
            token_start[ti_] = tj * 0.02
            seen[ti_] = True
    # monotonic fill
    for k in range(1, n_tok + 1):
        token_start[k] = max(token_start[k], token_start[k - 1])
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
