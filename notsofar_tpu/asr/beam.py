"""Batched beam-search decoding for Whisper (beam_size=5 in the shipped
config, asr/asr.py:21).

One jitted lax.scan over decode steps; state is kept per (batch, beam):

* KV caches [B*K, ctx, D] in bfloat16 (halves the reorder traffic — the
  per-step beam reorder is the dominant memory cost of beam search),
* cumulative logprobs, finished latches, per-beam timestamp-rule state,
* the token buffer itself is carried and reordered with the same gather,
  avoiding host-side genealogy backtracking.

Semantics follow whisper's BeamSearchDecoder: finished hypotheses persist
(eot self-loop contributing zero logprob), candidates are expanded over
K*V and pruned to the top K per batch element, and the final hypothesis is
chosen by length-normalized average logprob (MaximumLikelihoodRanker with
length_penalty=None).
"""
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from notsofar_tpu.asr.decoding import NEG_INF, DecodeOptions, GreedyDecoder
from notsofar_tpu.asr.tokenizer import WhisperTokenizer
from notsofar_tpu.models.whisper import WhisperModel


class BeamDecoder(GreedyDecoder):
    """Shares the logit filters with GreedyDecoder; adds beam expansion."""

    def __init__(self, model: WhisperModel, tokenizer: WhisperTokenizer,
                 options: DecodeOptions = DecodeOptions(),
                 beam_size: int = 5, cache_dtype=jnp.bfloat16,
                 split_cache: bool = True):
        super().__init__(model, tokenizer, options)
        self.beam_size = beam_size
        self.cache_dtype = cache_dtype
        # split prompt/generated KV cache (see _beam_scan); exposed so
        # benches can A/B the unified-cache path
        self.split_cache = split_cache

    def _beam_caches(self, batch: int, cache_len: int):
        # sized to prompt+max_new (not n_text_ctx): the per-step beam
        # reorder gathers the WHOLE cache, so the tight width cuts the
        # dominant beam memory cost ~(448/cache_len)x
        d = self.model.dims
        ctx = min(cache_len, d.n_text_ctx)
        return [(jnp.zeros((batch, ctx, d.n_text_state), self.cache_dtype),
                 jnp.zeros((batch, ctx, d.n_text_state), self.cache_dtype))
                for _ in range(d.n_text_layer)]

    @partial(jax.jit, static_argnums=(0, 3))
    def _beam_scan(self, variables, xa, prompt_len: int, prompt_tokens,
                   pad_lens=None):
        """xa: [B, 1500, D]; prompt_tokens: [B, P]. pad_lens: optional [B]
        left-pad widths for per-row prompts (see GreedyDecoder). Returns
        (tokens [B, K, max_new], sum_lp [B, K], length [B, K],
        no_speech_prob [B])."""
        model, tok = self.model, self.tok
        K = self.beam_size
        B = xa.shape[0]
        BK = B * K
        V = model.dims.n_vocab
        d = model.dims

        # the prompt is IDENTICAL across a stream's K beams, so (a) the
        # prefill runs at batch B (not BK) and (b) its cache becomes the
        # SHARED prompt segment of a split prompt/generated cache: the
        # per-step beam reorder gathers only the [BK, G] generated
        # segment (G = 64-rounded max_new, vs prompt+new previously) and
        # the fused attention kernel reads each stream's prompt keys once
        # for all K beams — the full-width reorder gather was beam
        # decode's dominant per-step cost. The cross-attention memory was
        # already beam-folded the same way (_attend_precomputed).
        # Models whose head geometry the fused kernel does not cover
        # (dk not 64/128 — every whisper checkpoint has dk=64) keep the
        # unified-cache einsum path.
        use_split = (self.split_cache and d.n_text_state % 128 == 0
                     and d.n_text_state // d.n_text_head in (64, 128))
        max_new = min(self.opt.max_new_tokens,
                      model.dims.n_text_ctx - prompt_len)
        P = prompt_tokens.shape[1]
        cross_kvs = model.precompute_cross_kv(variables["decoder"], xa)
        if self.opt.cross_kv_quant:
            cross_kvs = model.quantize_cross_kv(cross_kvs)
        sot_pos = prompt_len - 1 - (2 if len(tok.sot_sequence) == 3 else 0)
        pad_k = jnp.repeat(pad_lens, K, axis=0) if pad_lens is not None \
            else None
        if use_split:
            G = -(-max_new // 64) * 64
            prompt_caches = [
                (jnp.zeros((B, P, d.n_text_state), self.cache_dtype),
                 jnp.zeros((B, P, d.n_text_state), self.cache_dtype))
                for _ in range(d.n_text_layer)]
            logits, prompt_caches, _ = model.decoder.apply(
                variables["decoder"], prompt_tokens, xa, 0, prompt_caches,
                cross_kvs=cross_kvs, pad_lens=pad_lens)
            nsp = jax.nn.softmax(logits[:, sot_pos],
                                 axis=-1)[:, tok.no_speech]
            cur_logits = jnp.repeat(logits[:, -1], K, axis=0)   # [BK, V]
            caches = [
                (jnp.zeros((BK, G, d.n_text_state), self.cache_dtype),
                 jnp.zeros((BK, G, d.n_text_state), self.cache_dtype))
                for _ in range(d.n_text_layer)]
        else:
            prompt_k = jnp.repeat(prompt_tokens, K, axis=0)     # [BK, P]
            budget = max_new + prompt_len
            caches = self._beam_caches(BK, -(-budget // 64) * 64)
            logits, caches, _ = model.decoder.apply(
                variables["decoder"], prompt_k, xa, 0, caches,
                cross_kvs=cross_kvs, pad_lens=pad_k)
            nsp = jax.nn.softmax(logits[::K, sot_pos],
                                 axis=-1)[:, tok.no_speech]
            cur_logits = logits[:, -1]                          # [BK, V]
            prompt_caches = None
        init = dict(
            step=jnp.zeros((), jnp.int32),
            caches=caches,
            # ancestry [B, K, G]: anc[b, j, s] = physical cache row whose
            # slot-s K/V belongs to logical beam j. Beam reordering
            # updates THIS (23 KB) instead of gathering the caches
            # (2x layers x [BK, G, D]) -- see attn_step_split.
            anc=(jnp.zeros((B, K, G), jnp.int32) if use_split else None),
            cur_logits=cur_logits,
            tokens=jnp.full((BK, max_new), self._eot, jnp.int32),
            sum_lp=jnp.tile(jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF), B),
            length=jnp.zeros(BK, jnp.int32),
            finished=jnp.zeros(BK, bool),
            prev_was_ts=jnp.zeros(BK, bool),
            prev_prev_was_ts=jnp.zeros(BK, bool),
            last_ts=jnp.full(BK, self._ts_begin, jnp.int32),
            any_ts=jnp.zeros(BK, bool),
        )

        def step_fn(st):
            step = st["step"]
            lg = st["cur_logits"] + self._suppress
            lg = jnp.where(step == 0, lg + self._suppress_blank, lg)
            if not self.opt.without_timestamps:
                lg = self._apply_timestamp_rules(
                    lg, st["prev_was_ts"], st["prev_prev_was_ts"],
                    st["last_ts"], st["any_ts"], step)
            lp = jax.nn.log_softmax(lg, axis=-1)                # [BK, V]
            # finished beams: only eot, contributing zero logprob
            eot_only = jnp.full((V,), NEG_INF).at[self._eot].set(0.0)
            lp = jnp.where(st["finished"][:, None], eot_only[None, :], lp)

            cand = st["sum_lp"][:, None] + lp                    # [BK, V]
            cand = cand.reshape(B, K * V)
            top_lp, top_idx = jax.lax.top_k(cand, K)             # [B, K]
            src_beam = top_idx // V                              # beam within B
            next_tok = (top_idx % V).astype(jnp.int32)           # [B, K]
            # flat gather indices into the BK axis
            gather = (jnp.arange(B)[:, None] * K + src_beam).reshape(BK)
            next_tok_flat = next_tok.reshape(BK)

            def g(x):
                return x[gather]

            if use_split:
                # NO cache gather: reordering is an ancestry update (the
                # kernel reads history through the anc-derived mask). The
                # new token's K/V will be written at the logical row
                # itself, so slot `step` ancestors to own row.
                new_caches = st["caches"]
                anc = jnp.take_along_axis(st["anc"], src_beam[..., None],
                                          axis=1)
                anc = anc.at[:, :, step].set(
                    jnp.broadcast_to(jnp.arange(K)[None, :], (B, K)))
            else:
                new_caches = [(g(ck), g(cv)) for ck, cv in st["caches"]]
                anc = None
            tokens = g(st["tokens"]).at[:, step].set(next_tok_flat)
            finished = g(st["finished"])
            is_eot = (next_tok_flat == self._eot) | finished
            length = g(st["length"]) + jnp.where(is_eot, 0, 1)
            new_finished = finished | (next_tok_flat == self._eot)
            is_ts = (next_tok_flat >= self._ts_begin) & ~new_finished
            new_state = dict(
                step=step + 1,
                tokens=tokens,
                anc=anc,
                sum_lp=top_lp.reshape(BK),
                length=length,
                finished=new_finished,
                prev_was_ts=is_ts,
                prev_prev_was_ts=g(st["prev_was_ts"]),
                last_ts=jnp.where(is_ts, next_tok_flat, g(st["last_ts"])),
                any_ts=g(st["any_ts"]) | is_ts,
            )
            if use_split:
                split = [(kp, vp, kg, vg, anc) for (kp, vp), (kg, vg)
                         in zip(prompt_caches, new_caches)]
                new_logits, out_caches, _ = model.decoder.apply(
                    variables["decoder"], next_tok_flat[:, None], xa,
                    P + step, split, cross_kvs=cross_kvs, pad_lens=pad_k)
                new_state["caches"] = [(kg, vg)
                                       for _, _, kg, vg, _ in out_caches]
            else:
                new_logits, out_caches, _ = model.decoder.apply(
                    variables["decoder"], next_tok_flat[:, None], xa,
                    prompt_len + step, new_caches, cross_kvs=cross_kvs,
                    pad_lens=pad_k)
                new_state["caches"] = out_caches
            new_state["cur_logits"] = new_logits[:, 0]
            return new_state

        def cond_fn(st):
            return (st["step"] < max_new) & ~jnp.all(st["finished"])

        final = jax.lax.while_loop(cond_fn, step_fn, init)
        # pack float outputs into one buffer (one host read = one tunnel
        # round trip): [B, 2K+1] = sum_lp || length || no_speech
        stats = jnp.concatenate(
            [final["sum_lp"].reshape(B, K),
             final["length"].reshape(B, K).astype(jnp.float32),
             nsp[:, None]], axis=1)
        return final["tokens"].reshape(B, K, max_new), stats

    # ------------------------------------------------------------------
    def decode(self, variables, xa: jnp.ndarray,
               prompt: Optional[Sequence[int]] = None) -> Dict:
        tok = self.tok
        B = xa.shape[0]
        cap = max(self.opt.max_rows_per_dispatch // self.beam_size, 1)
        if B > cap:
            # HBM: the per-(batch*beam)-row cross-KV cache bounds how many
            # rows one dispatch can hold (see DecodeOptions)
            outs = [self.decode(variables, xa[c0:c0 + cap], prompt)
                    for c0 in range(0, B, cap)]
            return dict(
                tokens=[t for o in outs for t in o["tokens"]],
                avg_logprob=np.concatenate(
                    [o["avg_logprob"] for o in outs]),
                no_speech_prob=np.concatenate(
                    [o["no_speech_prob"] for o in outs]))
        prefix = list(prompt) if prompt else []
        if prefix:
            prefix = [tok.specials.sot_prev] + \
                prefix[-(self.model.dims.n_text_ctx // 2 - 1):]
        initial = prefix + tok.sot_sequence
        prompt_tokens = jnp.asarray(
            np.tile(np.asarray(initial, np.int32), (B, 1)))
        tokens, stats = self._beam_scan(
            variables, xa, len(initial), prompt_tokens)
        return self._unpack_beam(np.asarray(tokens), np.asarray(stats))

    def _unpack_beam(self, tokens: np.ndarray, stats: np.ndarray) -> Dict:
        B, K = tokens.shape[:2]
        sum_lp, length, nsp = stats[:, :K], stats[:, K:2 * K], stats[:, -1]
        # length-normalized ranking (whisper's MaximumLikelihoodRanker)
        avg = sum_lp / np.maximum(length + 1, 1)
        best = avg.argmax(axis=1)
        out_tokens: List[List[int]] = []
        for b in range(B):
            t = tokens[b, best[b]]
            end = int(np.argmax(t == self._eot)) if (t == self._eot).any() \
                else len(t)
            out_tokens.append(t[:end].tolist())
        return dict(tokens=out_tokens,
                    avg_logprob=avg[np.arange(B), best],
                    no_speech_prob=nsp)

    def decode_prompted(self, variables, xa: jnp.ndarray,
                        prompts: Sequence[Optional[Sequence[int]]],
                        temperature: float = 0.0, rng=None) -> Dict:
        """Beam decode with a DIFFERENT prompt per row (see
        GreedyDecoder.decode_prompted). temperature/rng accepted for
        interface parity; the beam path is deterministic (the fallback
        ladder samples through the greedy sampler, as in whisper)."""
        assert temperature == 0.0, "beam search is the t=0 rung"
        B = xa.shape[0]
        cap = max(self.opt.max_rows_per_dispatch // self.beam_size, 1)
        if B > cap:
            outs = [self.decode_prompted(variables, xa[c0:c0 + cap],
                                         list(prompts)[c0:c0 + cap])
                    for c0 in range(0, B, cap)]
            return dict(
                tokens=[t for o in outs for t in o["tokens"]],
                avg_logprob=np.concatenate(
                    [o["avg_logprob"] for o in outs]),
                no_speech_prob=np.concatenate(
                    [o["no_speech_prob"] for o in outs]))
        toks, pads, P_pad = self._pack_prompts(prompts)
        tokens, stats = self._beam_scan(
            variables, xa, P_pad, jnp.asarray(toks),
            pad_lens=jnp.asarray(pads))
        return self._unpack_beam(np.asarray(tokens), np.asarray(stats))
