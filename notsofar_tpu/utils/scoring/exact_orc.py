"""Exact time-pruned tcORC-WER for bounded sessions (golden scorer).

The production tcorc_wer (tcpwer.py:190) finds the utterance->stream
assignment by multi-start exact-rescoring local search — formally an upper
bound. This module computes the EXACT optimum for sessions whose overlap
structure is bounded, serving as the in-repo golden the test suite
certifies the production scorer against (the reference treats meeteval as
the frozen golden, /root/reference/utils/scoring.py:108-125; meeteval is
unavailable in this environment).

Method — exact temporal block decomposition:
The time-constrained Levenshtein kernel only allows matching a reference
word (collar-extended interval) with a hypothesis word whose interval
STRICTLY overlaps it (levenshtein.py:80-83). Therefore, at any time point
T crossed by no collar-extended reference-word interval and no hypothesis
word interval, every alignment decomposes: cross-T matches are forbidden,
and insertions/deletions are local. Utterance assignments interact only
within such maximal "blocks" of mutually overlapping intervals, so

    exact_errors = sum over blocks of min over S^{U_block} assignments

with two pruning facts keeping the enumeration feasible:
  * only streams with words inside the block are distinct choices — all
    word-free streams are interchangeable pure-deletion sinks, so one
    canonical 'empty' choice represents them;
  * real meetings rarely have more than a handful of utterances whose
    collar-extended spans mutually chain, so U_block stays small. Blocks
    larger than max_block_utts raise (the session is not exactly scorable
    by this method).
"""
import itertools
from typing import Dict, List

import numpy as np

from notsofar_tpu.utils.scoring.levenshtein import EditCounts
from notsofar_tpu.utils.scoring.seglst import SegLst
from notsofar_tpu.utils.scoring.tcpwer import (Vocab, WordSeq, _concat_seqs,
                                               _speaker_word_seqs, _tclev,
                                               _utterances)


def _sub_seq(seq: WordSeq, idx: List[int]) -> WordSeq:
    ii = np.asarray(idx, np.int64)
    return WordSeq(seq.ids[ii], seq.beg[ii], seq.end[ii])


def tcorc_wer_exact(ref: SegLst, hyp: SegLst, collar: float = 5.0,
                    max_block_utts: int = 14) -> Dict:
    """Exact tcORC-WER via temporal block decomposition.

    Raises ValueError when a block holds more than max_block_utts
    utterances with more than one distinct stream choice (enumeration
    would exceed ~S^max_block_utts)."""
    vocab = Vocab()
    streams = _speaker_word_seqs(hyp, vocab)
    stream_ids = sorted(streams)
    utts = _utterances(ref, vocab)
    S = len(stream_ids)
    length = sum(len(u.seq) for u in utts)

    if S == 0 or length == 0:
        ins = sum(len(s) for s in streams.values())
        errors = length + ins
        return dict(error_rate=errors / length if length
                    else float(errors > 0),
                    errors=errors, length=length, insertions=ins,
                    deletions=length, substitutions=0)

    # interval items: (start, end, kind, payload); utterances use their
    # words' collar-extended pseudo-time extent
    items = []
    for ui, u in enumerate(utts):
        items.append((float(u.seq.beg.min()) - collar,
                      float(u.seq.end.max()) + collar, "u", ui))
    for sid in stream_ids:
        st = streams[sid]
        for wi in range(len(st)):
            items.append((float(st.beg[wi]), float(st.end[wi]), "h",
                          (sid, wi)))
    items.sort(key=lambda x: (x[0], x[1]))

    # sweep into maximal overlap blocks; the kernel's overlap test is
    # strict (beg < end), so a new item starting exactly at the current
    # block's max end cannot interact with it
    blocks: List[List] = []
    cur_end = -np.inf
    for it in items:
        if not blocks or it[0] >= cur_end:
            blocks.append([it])
            cur_end = it[1]
        else:
            blocks[-1].append(it)
            cur_end = max(cur_end, it[1])

    tot = dict(errors=0, substitutions=0, insertions=0, deletions=0)
    for block in blocks:
        but = sorted(ui for _, _, k, ui in block if k == "u")
        by_stream: Dict[str, List[int]] = {}
        for _, _, k, p in block:
            if k == "h":
                by_stream.setdefault(p[0], []).append(p[1])
        active = sorted(by_stream)
        if not but:
            # pure insertions: no utterance can claim these words
            for sid in active:
                tot["errors"] += len(by_stream[sid])
                tot["insertions"] += len(by_stream[sid])
            continue
        block_streams = {sid: _sub_seq(streams[sid], sorted(by_stream[sid]))
                         for sid in active}
        choices: List = list(active)
        if len(active) < S:
            choices.append(None)   # canonical pure-deletion (empty) stream
        if len(choices) > 1 and len(but) > max_block_utts:
            raise ValueError(
                f"block with {len(but)} utterances x {len(choices)} choices "
                f"exceeds max_block_utts={max_block_utts}; session not "
                "exactly scorable by block decomposition")
        best = None
        for assign in itertools.product(range(len(choices)),
                                        repeat=len(but)):
            counts = []
            for ci, ch in enumerate(choices):
                refcat = _concat_seqs(
                    [utts[ui].seq for ui, a in zip(but, assign) if a == ci])
                if ch is None:
                    counts.append(EditCounts(len(refcat), 0, 0,
                                             len(refcat)))
                else:
                    counts.append(_tclev(refcat, block_streams[ch], collar))
            errs = sum(c.errors for c in counts)
            if best is None or errs < best[0]:
                best = (errs, counts)
        tot["errors"] += best[0]
        for c in best[1]:
            tot["substitutions"] += c.substitutions
            tot["insertions"] += c.insertions
            tot["deletions"] += c.deletions

    return dict(error_rate=tot["errors"] / length, length=length, **tot)
