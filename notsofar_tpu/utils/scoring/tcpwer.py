"""tcpWER and tcORC-WER session metrics.

Native rebuild of the meeteval metrics the reference delegates to
(utils/scoring.py:108-125; meeteval is not available in this environment):

* tcpWER — time-constrained minimum-permutation WER: per (ref speaker, hyp
  speaker) pair a time-constrained Levenshtein distance (collar-extended
  reference word intervals, character-based pseudo word timings), optimal
  bijective speaker assignment via the Hungarian method with unmatched
  speakers scored as pure deletions/insertions.
* tcORC-WER — time-constrained ORC WER: reference utterances are assigned
  to hypothesis streams; each stream is scored against the time-ordered
  concatenation of its assigned utterances. The assignment is found by
  multi-start exact-rescoring local search (single moves, joint moves of
  time-overlapping pairs and triples). Formally an upper bound of the
  exact ORC optimum, but it matches a brute-force oracle on every
  randomized adversarial instance tested (see
  tests/test_scoring.py::test_tcorc_matches_exact_on_small_instances).

Both metrics share the native time-constrained Levenshtein kernel
(levenshtein.py / native/tclev.cpp).
"""
import itertools
import bisect
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

from notsofar_tpu.utils.scoring.levenshtein import EditCounts, tc_levenshtein
from notsofar_tpu.utils.scoring.seglst import SegLst, words_with_pseudo_times


@dataclass
class WordSeq:
    ids: np.ndarray      # int32 vocab ids
    beg: np.ndarray      # float64 begin times
    end: np.ndarray      # float64 end times

    def __len__(self):
        return len(self.ids)

    @staticmethod
    def empty() -> "WordSeq":
        return WordSeq(np.zeros(0, np.int32), np.zeros(0), np.zeros(0))


class Vocab:
    def __init__(self):
        self._ids: Dict[str, int] = {}

    def __getitem__(self, w: str) -> int:
        if w not in self._ids:
            self._ids[w] = len(self._ids)
        return self._ids[w]


def _speaker_word_seqs(seglst: SegLst, vocab: Vocab) -> Dict[str, WordSeq]:
    """Group by speaker; segments sorted by start time ('segment' sort),
    words get character-based pseudo timings."""
    out: Dict[str, WordSeq] = {}
    for spk, segs in seglst.groupby("speaker").items():
        ordered = sorted(segs.segments, key=lambda s: float(s["start_time"]))
        ids, beg, end = [], [], []
        for seg in ordered:
            for w in words_with_pseudo_times(seg):
                ids.append(vocab[w["word"]])
                beg.append(w["begin"])
                end.append(w["end"])
        if ids:
            out[spk] = WordSeq(np.asarray(ids, np.int32),
                               np.asarray(beg), np.asarray(end))
    return out


def _concat_seqs(seqs: List[WordSeq]) -> WordSeq:
    if not seqs:
        return WordSeq.empty()
    return WordSeq(np.concatenate([s.ids for s in seqs]),
                   np.concatenate([s.beg for s in seqs]),
                   np.concatenate([s.end for s in seqs]))


def _tclev(ref: WordSeq, hyp: WordSeq, collar: float) -> EditCounts:
    return tc_levenshtein(ref.ids, ref.beg - collar, ref.end + collar,
                          hyp.ids, hyp.beg, hyp.end)


# --------------------------------------------------------------------------
# tcpWER
# --------------------------------------------------------------------------

def tcp_wer(ref: SegLst, hyp: SegLst, collar: float = 5.0) -> Dict:
    """Time-constrained minimum-permutation WER for one session.

    Returns a dict with meeteval-compatible keys: error_rate, errors,
    length, insertions, deletions, substitutions, missed_speaker,
    falarm_speaker, scored_speaker, assignment.
    """
    vocab = Vocab()
    ref_seqs = _speaker_word_seqs(ref, vocab)
    hyp_seqs = _speaker_word_seqs(hyp, vocab)
    ref_spks = sorted(ref_seqs)
    hyp_spks = sorted(hyp_seqs)
    R, H = len(ref_spks), len(hyp_spks)

    pair = np.zeros((R, H), np.int64)
    pair_counts: Dict[Tuple[int, int], EditCounts] = {}
    for i, r in enumerate(ref_spks):
        for j, h in enumerate(hyp_spks):
            c = _tclev(ref_seqs[r], hyp_seqs[h], collar)
            pair[i, j] = c.errors
            pair_counts[(i, j)] = c

    INF = 10 ** 12
    n = R + H
    cost = np.full((n, n), INF, np.int64)
    cost[:R, :H] = pair
    for i in range(R):   # ref speaker left unmatched -> all deletions
        cost[i, H + i] = len(ref_seqs[ref_spks[i]])
    for j in range(H):   # hyp speaker left unmatched -> all insertions
        cost[R + j, j] = len(hyp_seqs[hyp_spks[j]])
    cost[R:, H:] = 0
    rows, cols = linear_sum_assignment(cost)

    errors = subs = ins = dels = 0
    assignment: List[Tuple[Optional[str], Optional[str]]] = []
    missed = falarm = 0
    for i, j in zip(rows, cols):
        if i < R and j < H:
            c = pair_counts[(i, j)]
            errors += c.errors
            subs += c.substitutions
            ins += c.insertions
            dels += c.deletions
            assignment.append((ref_spks[i], hyp_spks[j]))
        elif i < R:
            dels += len(ref_seqs[ref_spks[i]])
            errors += len(ref_seqs[ref_spks[i]])
            missed += 1
            assignment.append((ref_spks[i], None))
        elif j < H:
            ins += len(hyp_seqs[hyp_spks[j]])
            errors += len(hyp_seqs[hyp_spks[j]])
            falarm += 1
            assignment.append((None, hyp_spks[j]))

    length = sum(len(s) for s in ref_seqs.values())
    return dict(
        error_rate=errors / length if length else float(errors > 0),
        errors=errors, length=length,
        insertions=ins, deletions=dels, substitutions=subs,
        missed_speaker=missed, falarm_speaker=falarm, scored_speaker=R,
        assignment=assignment,
    )


# --------------------------------------------------------------------------
# tcORC-WER
# --------------------------------------------------------------------------

@dataclass
class _Utt:
    seq: WordSeq
    start: float
    end: float


def _utterances(ref: SegLst, vocab: Vocab) -> List[_Utt]:
    utts = []
    for seg in sorted(ref.segments, key=lambda s: float(s["start_time"])):
        ws = words_with_pseudo_times(seg)
        if not ws:
            continue
        utts.append(_Utt(
            WordSeq(np.asarray([vocab[w["word"]] for w in ws], np.int32),
                    np.asarray([w["begin"] for w in ws]),
                    np.asarray([w["end"] for w in ws])),
            float(seg["start_time"]), float(seg["end_time"])))
    return utts


def _stream_window(stream: WordSeq, t0: float, t1: float) -> WordSeq:
    lo = bisect.bisect_left(stream.beg.tolist(), t0)
    hi = bisect.bisect_right(stream.beg.tolist(), t1)
    return WordSeq(stream.ids[lo:hi], stream.beg[lo:hi], stream.end[lo:hi])


def tcorc_wer(ref: SegLst, hyp: SegLst, collar: float = 5.0,
              refine_passes: int = 16, certify: bool = True) -> Dict:
    """Time-constrained ORC WER for one session.

    Hypothesis 'speaker' field is the stream id (the reference factorizes
    the CSS wav file name into it, inference_pipeline/inference.py:146).

    certify=True (default) additionally runs the exact block-decomposition
    DP (exact_orc.tcorc_certificate) and attaches a 'certificate' dict:
    certificate['exact'] says whether the reported number is the TRUE
    ORC optimum (every overlap block solved by the native DP) or only the
    local search's upper bound, with block-size stats either way. When the
    exact optimum beats the local search (never observed in the
    differential tests, but possible in principle), the exact counts are
    reported and 'assignment' is dropped (the DP does not track one).
    """
    vocab = Vocab()
    streams = _speaker_word_seqs(hyp, vocab)
    stream_ids = sorted(streams)
    utts = _utterances(ref, vocab)
    S = len(stream_ids)
    length = sum(len(u.seq) for u in utts)

    if S == 0 or length == 0:
        ins = sum(len(s) for s in streams.values())
        errors = length + ins
        return dict(error_rate=errors / length if length else float(errors > 0),
                    errors=errors, length=length, insertions=ins,
                    deletions=length, substitutions=0, assignment=[])

    # 1. windowed greedy init: local alignment cost of each utterance
    # against each stream's temporal neighborhood.
    assign = []
    for u in utts:
        best, best_s = None, 0
        for si, sid in enumerate(stream_ids):
            win = _stream_window(streams[sid], u.start - collar, u.end + collar)
            c = _tclev(u.seq, win, collar)
            # insertions inside the window are not really errors (other
            # utterances may claim them) — score matching quality only.
            local = c.errors - c.insertions
            if best is None or local < best:
                best, best_s = local, si
        assign.append(best_s)

    def stream_counts(a: List[int]) -> List[EditCounts]:
        out = []
        for si, sid in enumerate(stream_ids):
            refcat = _concat_seqs([u.seq for u, s in zip(utts, a) if s == si])
            out.append(_tclev(refcat, streams[sid], collar))
        return out

    # pairs of time-overlapping utterances (within collar): the only
    # place single moves get stuck — two confusable utterances each block
    # the other's stream, so both must move at once.
    overlapping_pairs = [
        (ui, uj)
        for ui in range(len(utts)) for uj in range(ui + 1, len(utts))
        if utts[ui].end + collar > utts[uj].start
        and utts[uj].end + collar > utts[ui].start]
    pairset = set(overlapping_pairs)
    # pairwise-overlapping triples (≥3 concurrent speakers is rare, so the
    # set stays small even in long sessions)
    overlapping_triples = [
        (ui, uj, uk)
        for ui, uj in overlapping_pairs for uk in range(uj + 1, len(utts))
        if (ui, uk) in pairset and (uj, uk) in pairset]

    def rescore(base_counts, trial: List[int],
                delta_streams) -> List[EditCounts]:
        trial_counts = list(base_counts)
        for ds in delta_streams:
            refcat = _concat_seqs(
                [u.seq for u, s in zip(utts, trial) if s == ds])
            trial_counts[ds] = _tclev(refcat, streams[stream_ids[ds]],
                                      collar)
        return trial_counts

    def descend(a: List[int]):
        """Exact-rescoring coordinate descent: single moves, then joint
        moves of overlapping pairs when singles converge."""
        a = list(a)
        counts = stream_counts(a)
        total = sum(c.errors for c in counts)
        for _ in range(refine_passes):
            improved = False
            for ui in range(len(utts)):
                cur = a[ui]
                for si in range(S):
                    if si == cur:
                        continue
                    trial = list(a)
                    trial[ui] = si
                    trial_counts = rescore(counts, trial, {cur, si})
                    trial_total = sum(c.errors for c in trial_counts)
                    if trial_total < total:
                        a, counts, total = trial, trial_counts, trial_total
                        improved = True
                        break
            if improved:
                continue
            for ui, uj in overlapping_pairs:
                ci, cj = a[ui], a[uj]
                for si in range(S):
                    for sj in range(S):
                        if (si, sj) == (ci, cj):
                            continue
                        trial = list(a)
                        trial[ui], trial[uj] = si, sj
                        trial_counts = rescore(counts, trial,
                                               {ci, cj, si, sj})
                        trial_total = sum(c.errors for c in trial_counts)
                        if trial_total < total:
                            a, counts = trial, trial_counts
                            total = trial_total
                            improved = True
                            break
                    if improved:
                        break
                if improved:
                    break
            if improved:
                continue
            for tri in overlapping_triples:
                cur3 = tuple(a[x] for x in tri)
                for alt in itertools.product(range(S), repeat=3):
                    if alt == cur3:
                        continue
                    trial = list(a)
                    for x, sx in zip(tri, alt):
                        trial[x] = sx
                    trial_counts = rescore(counts, trial,
                                           set(cur3) | set(alt))
                    trial_total = sum(c.errors for c in trial_counts)
                    if trial_total < total:
                        a, counts = trial, trial_counts
                        total = trial_total
                        improved = True
                        break
                if improved:
                    break
            if not improved:
                break
        return a, counts, total

    # 2. multi-start descent: the greedy init plus deterministic restarts
    # (round-robin over time order, and seeded shuffles) — local minima of
    # the single+pair move neighborhood depend strongly on the start.
    rng = np.random.RandomState(1234)
    inits = [assign, [ui % S for ui in range(len(utts))]] + \
        [list(rng.randint(0, S, len(utts))) for _ in range(2)]
    seen_inits = set()
    best = None
    for init in inits:
        key = tuple(init)
        if key in seen_inits:
            continue
        seen_inits.add(key)
        cand = descend(init)
        if best is None or cand[2] < best[2]:
            best = cand
    assign, counts, total = best

    errors = sum(c.errors for c in counts)
    out = dict(
        error_rate=errors / length if length else float(errors > 0),
        errors=errors, length=length,
        insertions=sum(c.insertions for c in counts),
        deletions=sum(c.deletions for c in counts),
        substitutions=sum(c.substitutions for c in counts),
        assignment=[stream_ids[s] for s in assign],
    )
    if certify:
        # exact block-decomposition DP: states whether the local-search
        # result above is the true optimum (VERDICT r4 item 8 — a silent
        # over-count on a pathological session must not go unflagged)
        from notsofar_tpu.utils.scoring.exact_orc import tcorc_certificate
        cert = tcorc_certificate(ref, hyp, collar)
        exact_counts = cert.pop("counts", None)
        if cert["exact"] and cert["optimum"] < errors:
            # the DP found a strictly better assignment: report the true
            # optimum (no assignment available from the counts-only DP)
            out.update(
                errors=exact_counts.errors,
                error_rate=exact_counts.errors / length,
                insertions=exact_counts.insertions,
                deletions=exact_counts.deletions,
                substitutions=exact_counts.substitutions,
                assignment=None)
        cert["matches_local_search"] = (cert["optimum"] == errors
                                        if cert["exact"] else None)
        out["certificate"] = cert
    return out
