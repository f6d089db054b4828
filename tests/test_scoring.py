"""Scorer tests: time-constrained Levenshtein kernel, tcpWER speaker
assignment, tcORC-WER stream assignment, and the calc_wer dataframe
contract."""
import numpy as np
import pandas as pd
import pytest

from notsofar_tpu.utils.scoring import calc_wer
from notsofar_tpu.utils.scoring.levenshtein import levenshtein, tc_levenshtein
from notsofar_tpu.utils.scoring.seglst import SegLst, words_with_pseudo_times
from notsofar_tpu.utils.scoring.tcpwer import tcorc_wer, tcp_wer


def ids(*ws):
    vocab = {}
    return np.asarray([vocab.setdefault(w, len(vocab)) for w in ws], np.int32)


def test_plain_levenshtein():
    a = ids("a", "b", "c")
    b = np.asarray([0, 1, 1], np.int32)  # a b b
    c = levenshtein(a, b)
    assert c.errors == 1 and c.substitutions == 1


def test_tclev_blocks_far_matches():
    """Identical words that never overlap in time must cost ins+del."""
    r_ids = np.asarray([0], np.int32)
    h_ids = np.asarray([0], np.int32)
    near = tc_levenshtein(r_ids, np.array([0.0]), np.array([1.0]),
                          h_ids, np.array([0.5]), np.array([1.5]))
    far = tc_levenshtein(r_ids, np.array([0.0]), np.array([1.0]),
                         h_ids, np.array([100.0]), np.array([101.0]))
    assert near.errors == 0
    assert far.errors == 2 and far.insertions == 1 and far.deletions == 1


def test_tclev_numpy_fallback_agrees():
    from notsofar_tpu.utils.scoring.levenshtein import _tc_lev_numpy
    rng = np.random.RandomState(0)
    for _ in range(10):
        n, m = rng.randint(1, 30), rng.randint(1, 30)
        r_ids = rng.randint(0, 5, n).astype(np.int32)
        h_ids = rng.randint(0, 5, m).astype(np.int32)
        rb = np.sort(rng.rand(n) * 10)
        hb = np.sort(rng.rand(m) * 10)
        re_, he = rb + 1.0, hb + 1.0
        a = tc_levenshtein(r_ids, rb, re_, h_ids, hb, he)
        b = _tc_lev_numpy(r_ids, rb, re_, h_ids, hb, he)
        assert a.errors == b.errors
        assert (a.substitutions, a.insertions, a.deletions) == \
               (b.substitutions, b.insertions, b.deletions)


def _seg(sess, spk, t0, t1, words):
    return dict(session_id=sess, speaker=spk, start_time=t0, end_time=t1,
                words=words)


def test_pseudo_word_times_character_based():
    ws = words_with_pseudo_times(_seg("s", "a", 0.0, 10.0, "ab abc abcde"))
    # char proportions 2:3:5 over 10s
    assert ws[0]["begin"] == 0.0 and abs(ws[0]["end"] - 2.0) < 1e-9
    assert abs(ws[1]["end"] - 5.0) < 1e-9
    assert abs(ws[2]["end"] - 10.0) < 1e-9


def test_tcpwer_perfect_match():
    ref = SegLst([_seg("s", "A", 0, 2, "hello world"),
                  _seg("s", "B", 3, 5, "good morning")])
    hyp = SegLst([_seg("s", "spk0", 0.1, 2.1, "hello world"),
                  _seg("s", "spk1", 3.1, 5.1, "good morning")])
    res = tcp_wer(ref, hyp, collar=5)
    assert res["errors"] == 0
    assert res["error_rate"] == 0.0
    assert res["scored_speaker"] == 2
    assert res["missed_speaker"] == 0


def test_tcpwer_speaker_permutation_found():
    """Hyp speakers are swapped; assignment must recover zero errors."""
    ref = SegLst([_seg("s", "A", 0, 2, "one two three"),
                  _seg("s", "B", 3, 5, "four five six")])
    hyp = SegLst([_seg("s", "x", 3, 5, "four five six"),
                  _seg("s", "y", 0, 2, "one two three")])
    res = tcp_wer(ref, hyp, collar=5)
    assert res["errors"] == 0
    assert ("A", "y") in res["assignment"] and ("B", "x") in res["assignment"]


def test_tcpwer_missed_and_falarm():
    ref = SegLst([_seg("s", "A", 0, 2, "a b"),
                  _seg("s", "B", 3, 5, "c d e")])
    hyp = SegLst([_seg("s", "h0", 0, 2, "a b")])
    res = tcp_wer(ref, hyp, collar=5)
    assert res["missed_speaker"] == 1
    assert res["deletions"] == 3
    assert res["errors"] == 3
    assert res["length"] == 5

    hyp2 = SegLst([_seg("s", "h0", 0, 2, "a b"),
                   _seg("s", "h1", 3, 5, "c d e"),
                   _seg("s", "h2", 6, 8, "x y")])
    res2 = tcp_wer(ref, hyp2, collar=5)
    assert res2["falarm_speaker"] == 1
    assert res2["insertions"] == 2


def test_tcpwer_collar_blocks_distant_match():
    ref = SegLst([_seg("s", "A", 0, 1, "hello")])
    hyp = SegLst([_seg("s", "h", 60, 61, "hello")])
    res = tcp_wer(ref, hyp, collar=5)
    assert res["errors"] == 2  # one deletion + one insertion
    res_big = tcp_wer(ref, hyp, collar=120)
    assert res_big["errors"] == 0


def test_tcorc_streams():
    """Two overlapping utterances must be creditable to separate streams."""
    ref = SegLst([_seg("s", "A", 0, 2, "one two three"),
                  _seg("s", "B", 0, 2, "alpha beta gamma")])
    hyp = SegLst([_seg("s", "0", 0, 2, "one two three"),
                  _seg("s", "1", 0, 2, "alpha beta gamma")])
    res = tcorc_wer(ref, hyp, collar=5)
    assert res["errors"] == 0
    assert res["length"] == 6


def test_tcorc_single_stream_sequential():
    ref = SegLst([_seg("s", "A", 0, 2, "one two"),
                  _seg("s", "B", 3, 5, "three four")])
    hyp = SegLst([_seg("s", "0", 0, 5, "one two three four")])
    res = tcorc_wer(ref, hyp, collar=5)
    assert res["errors"] == 0


def test_calc_wer_dataframe_contract(tmp_path):
    gt = pd.DataFrame([
        dict(meeting_id="MTG_0001", start_time=0.0, end_time=2.0,
             text="hello world", speaker_id="A"),
        dict(meeting_id="MTG_0001", start_time=3.0, end_time=5.0,
             text="good morning", speaker_id="B"),
    ])
    hyp = [dict(session_id="multichannel/MTG_0001_dev1",
                start_time=0.0, end_time=2.0, words="hello world",
                speaker="spk0"),
           dict(session_id="multichannel/MTG_0001_dev1",
                start_time=3.0, end_time=5.0, words="good morning",
                speaker="spk1")]
    df = calc_wer(tmp_path, hyp, hyp, gt, tn="chime8", collar=5)
    assert set(["session_id", "tcp_wer", "tcorc_wer", "tcp_errors",
                "tcp_length", "tcp_insertions", "tcp_deletions",
                "tcp_substitutions", "tcp_missed_speaker",
                "tcp_falarm_speaker", "tcp_scored_speaker",
                "tcp_assignment"]).issubset(df.columns)
    assert df.tcp_wer.iloc[0] == 0.0
    assert df.tcorc_wer.iloc[0] == 0.0
    assert (tmp_path / "ref.json").exists()


def test_calc_wer_normalization_applied(tmp_path):
    gt = pd.DataFrame([
        dict(meeting_id="MTG_0002", start_time=0.0, end_time=2.0,
             text="it costs $20 okay", speaker_id="A")])
    hyp = [dict(session_id="singlechannel/MTG_0002_dev2",
                start_time=0.0, end_time=2.0,
                words="It costs twenty dollars, OK!", speaker="spk0")]
    df = calc_wer(tmp_path, hyp, hyp, gt, tn="chime8", collar=5)
    assert df.tcp_wer.iloc[0] == 0.0


def test_calc_wer_visualization(tmp_path):
    gt = pd.DataFrame([
        dict(meeting_id="MTG_0003", start_time=0.0, end_time=2.0,
             text="hello world", speaker_id="A")])
    hyp = [dict(session_id="multichannel/MTG_0003_dev",
                start_time=0.0, end_time=2.0, words="hello world",
                speaker="spk0")]
    calc_wer(tmp_path, hyp, hyp, gt, tn="chime8", collar=5,
             save_visualizations=True)
    viz = tmp_path / "viz.html"
    assert viz.exists()
    txt = viz.read_text()
    assert "<svg" in txt and "tcpWER alignment" in txt


def _tcorc_exact_errors(ref, hyp, collar=5.0):
    """Brute force over all stream assignments (test oracle, S^U)."""
    import itertools
    from notsofar_tpu.utils.scoring.tcpwer import (Vocab, _concat_seqs,
                                                   _speaker_word_seqs,
                                                   _tclev, _utterances)
    vocab = Vocab()
    streams = _speaker_word_seqs(hyp, vocab)
    stream_ids = sorted(streams)
    utts = _utterances(ref, vocab)
    best = None
    for assign in itertools.product(range(len(stream_ids)), repeat=len(utts)):
        tot = 0
        for si, sid in enumerate(stream_ids):
            refcat = _concat_seqs(
                [u.seq for u, s in zip(utts, assign) if s == si])
            tot += _tclev(refcat, streams[sid], collar).errors
        if best is None or tot < best:
            best = tot
    return best


def test_tcorc_matches_exact_on_small_instances():
    """The local-search assignment must hit the brute-force optimum on
    randomized small sessions (certifies the upper bound is tight there)."""
    rng = np.random.RandomState(7)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    mismatches = []
    for case in range(30):
        S = int(rng.randint(2, 4))
        U = int(rng.randint(2, 6))
        ref_segs, hyp_segs = [], {f"st{j}": [] for j in range(S)}
        t = 0.0
        for u in range(U):
            t += float(rng.rand() * 3)
            dur = 1.0 + float(rng.rand() * 2)
            n = int(rng.randint(1, 4))
            ws = [words[rng.randint(len(words))] for _ in range(n)]
            ref_segs.append(_seg("s", f"spk{u % 3}", t, t + dur, " ".join(ws)))
            # noisy copy on a random stream
            hw = [w for w in ws if rng.rand() > 0.15]  # deletions
            if rng.rand() < 0.3:
                hw.append(words[rng.randint(len(words))])  # insertion
            if hw:
                j = int(rng.randint(S))
                jit = float(rng.rand() * 0.5)
                hyp_segs[f"st{j}"].append(
                    _seg("s", f"st{j}", t + jit, t + dur + jit, " ".join(hw)))
            t += dur
        ref = SegLst(ref_segs)
        hyp = SegLst([g for segs in hyp_segs.values() for g in segs])
        got = tcorc_wer(ref, hyp, collar=5)["errors"]
        exact = _tcorc_exact_errors(ref, hyp, collar=5)
        if got != exact:
            mismatches.append((case, got, exact))
    assert not mismatches, f"descent not optimal on: {mismatches}"


def test_tcorc_matches_exact_adversarial():
    """Two-word vocabulary + heavily overlapping utterances: the regime
    where greedy/single-move search gets stuck in local minima. The pair-
    and triple-move escalation with multi-start must reach the optimum."""
    rng = np.random.RandomState(11)
    words = ["a", "b"]
    mismatches = []
    for case in range(40):
        S = int(rng.randint(2, 4))
        U = int(rng.randint(3, 7))
        ref_segs, hyp = [], []
        t = 0.0
        for u in range(U):
            t += float(rng.rand() * 1.0)
            dur = 1.0 + float(rng.rand() * 2)
            ws = [words[rng.randint(2)] for _ in range(rng.randint(1, 4))]
            ref_segs.append(_seg("s", f"spk{u % 3}", t, t + dur,
                                 " ".join(ws)))
            hw = [w for w in ws if rng.rand() > 0.3]
            if rng.rand() < 0.5:
                hw.append(words[rng.randint(2)])
            if hw:
                j = int(rng.randint(S))
                jit = float(rng.rand() * 1.5)
                hyp.append(_seg("s", f"st{j}", t + jit, t + dur + jit,
                                " ".join(hw)))
            t += dur * 0.4
        got = tcorc_wer(SegLst(ref_segs), SegLst(hyp), collar=5)["errors"]
        exact = _tcorc_exact_errors(SegLst(ref_segs), SegLst(hyp), collar=5)
        if got != exact:
            mismatches.append((case, got, exact))
    assert not mismatches, f"descent not optimal on: {mismatches}"


def test_scoring_cli(tmp_path, capsys):
    import json
    from notsofar_tpu.utils.scoring.__main__ import main
    ref = [dict(session_id="s1", speaker="A", start_time=0.0, end_time=2.0,
                words="twenty five dollars")]
    hyp = [dict(session_id="s1", speaker="0", start_time=0.1, end_time=2.1,
                words="$25")]
    rp, hp = tmp_path / "ref.json", tmp_path / "hyp.json"
    rp.write_text(json.dumps(ref)); hp.write_text(json.dumps(hyp))
    main(["tcpwer", "-r", str(rp), "-H", str(hp)])
    out = json.loads(capsys.readouterr().out)
    assert out["errors"] == 0  # chime8 normalization unifies both sides
    main(["tcorcwer", "-r", str(rp), "-H", str(hp), "--normalizer", "none"])
    out = json.loads(capsys.readouterr().out)
    assert out["errors"] > 0


# ---------------------------------------------------------------------------
# exact block-decomposed tcORC golden (utils/scoring/exact_orc.py)
# ---------------------------------------------------------------------------

def _random_session(rng, U, S, words, overlap_rate=0.3, max_gap=3.0):
    """Meeting-ish session: mostly sequential turns, occasional overlap."""
    ref_segs, hyp_segs = [], []
    t = 0.0
    for u in range(U):
        if rng.rand() < overlap_rate and u > 0:
            t -= float(rng.rand() * 1.5)     # overlap the previous turn
        else:
            t += float(rng.rand() * max_gap)
        dur = 1.0 + float(rng.rand() * 2)
        n = int(rng.randint(1, 5))
        ws = [words[rng.randint(len(words))] for _ in range(n)]
        ref_segs.append(_seg("s", f"spk{u % 4}", t, t + dur, " ".join(ws)))
        hw = [w for w in ws if rng.rand() > 0.15]
        if rng.rand() < 0.25:
            hw.append(words[rng.randint(len(words))])
        if hw:
            j = int(rng.randint(S))
            jit = float(rng.rand() * 0.5)
            hyp_segs.append(_seg("s", f"st{j}", t + jit, t + dur + jit,
                                 " ".join(hw)))
        t += dur
    return SegLst(ref_segs), SegLst(hyp_segs)


def test_exact_orc_matches_bruteforce_small():
    """The block-decomposed exact scorer must equal the S^U brute force."""
    from notsofar_tpu.utils.scoring.exact_orc import tcorc_wer_exact
    rng = np.random.RandomState(21)
    words = ["a", "b", "c", "d"]
    for case in range(30):
        S = int(rng.randint(2, 4))
        U = int(rng.randint(2, 7))
        ref, hyp = _random_session(rng, U, S, words, overlap_rate=0.5,
                                   max_gap=1.0)
        exact = tcorc_wer_exact(ref, hyp, collar=2.0, max_block_utts=8)
        brute = _tcorc_exact_errors(ref, hyp, collar=2.0)
        assert exact["errors"] == brute, \
            f"case {case}: block-exact {exact['errors']} != brute {brute}"


def test_production_tcorc_matches_exact_long_sessions():
    """Certify the production local-search tcORC against the exact golden
    on sessions far beyond brute-force reach (U up to 40; brute force
    would be S^40)."""
    from notsofar_tpu.utils.scoring.exact_orc import tcorc_wer_exact
    rng = np.random.RandomState(33)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    mismatches = []
    scored = 0
    for case in range(12):
        S = int(rng.randint(2, 4))
        U = int(rng.randint(25, 41))
        # max_gap 30 s: pauses regularly exceed 2*collar, cutting the
        # session into exactly-scorable blocks while overlap_rate keeps
        # the within-block assignment problems non-trivial
        ref, hyp = _random_session(rng, U, S, words, overlap_rate=0.3,
                                   max_gap=30.0)
        try:
            exact = tcorc_wer_exact(ref, hyp, collar=5.0,
                                    max_block_utts=10)["errors"]
        except ValueError:
            continue   # block too dense for exact scoring — skip case
        scored += 1
        got = tcorc_wer(ref, hyp, collar=5)["errors"]
        assert got >= exact  # production is an upper bound by construction
        if got != exact:
            mismatches.append((case, got, exact))
    assert scored >= 8, f"only {scored} sessions were exactly scorable"
    assert not mismatches, f"production above exact optimum on: {mismatches}"


def test_exact_orc_block_guard(monkeypatch):
    """Without the native DP, dense all-overlapping sessions must raise
    (not silently mis-score); with it, they score exactly."""
    from notsofar_tpu.utils.scoring import exact_orc
    ref = SegLst([_seg("s", f"spk{u}", 0.0, 2.0, "a b") for u in range(9)])
    hyp = SegLst([_seg("s", "st0", 0.0, 2.0, "a b"),
                  _seg("s", "st1", 0.0, 2.0, "a b")])
    monkeypatch.setattr(exact_orc, "_lib", None)
    monkeypatch.setattr(exact_orc, "_lib_tried", True)
    with pytest.raises(ValueError):
        exact_orc.tcorc_wer_exact(ref, hyp, collar=5.0, max_block_utts=4)
    monkeypatch.undo()
    if exact_orc._load_native() is not None:
        res = exact_orc.tcorc_wer_exact(ref, hyp, collar=5.0,
                                        max_block_utts=4)
        # 9 utterances x "a b" vs two streams carrying one "a b" each:
        # 2 utterances align perfectly, 7 are fully deleted
        assert res["errors"] == 14 and res["deletions"] == 14


def test_exact_orc_native_matches_enumeration():
    """The native multidimensional DP (native/orc.cpp) and the
    S^U assignment enumeration are independent formulations of the same
    optimum — they must agree exactly."""
    from notsofar_tpu.utils.scoring import exact_orc
    if exact_orc._load_native() is None:
        pytest.skip("native orc kernel unavailable")
    rng = np.random.RandomState(7)
    words = ["a", "b", "c", "d", "e"]
    for case in range(40):
        S = int(rng.randint(1, 4))
        U = int(rng.randint(1, 8))
        ref, hyp = _random_session(rng, U, S, words, overlap_rate=0.6,
                                   max_gap=1.0)
        native = exact_orc.tcorc_wer_exact(ref, hyp, collar=2.0)
        lib = exact_orc._lib
        exact_orc._lib = None
        try:
            enum = exact_orc.tcorc_wer_exact(ref, hyp, collar=2.0,
                                             max_block_utts=8)
        finally:
            exact_orc._lib = lib
        assert native["errors"] == enum["errors"], (case, native, enum)
        assert native["length"] == enum["length"]


def _chained_session(rng, U, S, words, chain_step=1.0, dur=3.0):
    """The #DebateOverlaps regime: every utterance overlaps the next, so
    collar-extended spans chain into ONE block of U utterances — exactly
    the shape the enumeration golden could not score (S^U)."""
    ref_segs, hyp_segs = [], []
    for u in range(U):
        t = u * chain_step
        n = int(rng.randint(1, 4))
        ws = [words[rng.randint(len(words))] for _ in range(n)]
        ref_segs.append(_seg("s", f"spk{u % 4}", t, t + dur, " ".join(ws)))
        hw = [w for w in ws if rng.rand() > 0.2]
        if rng.rand() < 0.3:
            hw.append(words[rng.randint(len(words))])
        if hw:
            j = int(rng.randint(S))
            jit = float(rng.rand() * 0.4)
            hyp_segs.append(_seg("s", f"st{j}", t + jit, t + dur + jit,
                                 " ".join(hw)))
    return SegLst(ref_segs), SegLst(hyp_segs)


def test_production_tcorc_on_chained_overlap_blocks():
    """Certify the production local-search tcORC against the exact DP on
    long mutual-overlap chains (VERDICT r3 item 6): U up to 24 utterances
    in a single block — the dense-overlap regime where blocks chain and
    the upper bound was previously unquantified. Gap must be ZERO."""
    from notsofar_tpu.utils.scoring.exact_orc import (_load_native,
                                                      tcorc_wer_exact)
    if _load_native() is None:
        pytest.skip("native orc kernel unavailable")
    rng = np.random.RandomState(91)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    gaps = []
    for case in range(10):
        S = int(rng.randint(2, 4))
        U = int(rng.randint(12, 25))
        # chain_step < dur => consecutive utterances always overlap;
        # with collar 2 the whole session is one block
        ref, hyp = _chained_session(rng, U, S, words,
                                    chain_step=float(1.0 + rng.rand()),
                                    dur=3.0)
        exact = tcorc_wer_exact(ref, hyp, collar=2.0)["errors"]
        got = tcorc_wer(ref, hyp, collar=2.0)["errors"]
        assert got >= exact    # production is an upper bound by construction
        gaps.append(got - exact)
    assert all(g == 0 for g in gaps), \
        f"production above exact optimum on chained blocks: gaps={gaps}"


def test_tcorc_certificate_exact_on_meeting_sessions():
    """Production tcorc_wer attaches a certificate (VERDICT r4 item 8):
    on meeting-shaped sessions every block must be natively solvable, the
    certificate must say exact=True, and the exact optimum must equal the
    local-search result."""
    from notsofar_tpu.utils.scoring.exact_orc import _load_native
    if _load_native() is None:
        pytest.skip("native orc kernel unavailable")
    rng = np.random.RandomState(5)
    words = ["alpha", "beta", "gamma", "delta"]
    for case in range(8):
        ref, hyp = _random_session(rng, int(rng.randint(6, 20)),
                                   int(rng.randint(2, 4)), words,
                                   overlap_rate=0.4)
        res = tcorc_wer(ref, hyp, collar=3.0)
        cert = res["certificate"]
        assert cert["exact"], (case, cert)
        assert cert["infeasible_blocks"] == 0
        assert cert["optimum"] == res["errors"], (case, cert, res["errors"])
        assert cert["matches_local_search"] is True
        assert cert["n_blocks"] >= 1


def test_tcorc_certificate_upper_bound_flag(monkeypatch):
    """When the exact DP cannot cover a block (native kernel unavailable,
    enumeration disabled in the certificate pass), the scorer must mark
    its result as an upper bound instead of silently claiming exactness —
    and still return the local-search numbers unchanged."""
    from notsofar_tpu.utils.scoring import exact_orc
    ref = SegLst([_seg("s", f"spk{u}", 0.0, 2.0, "a b") for u in range(12)])
    hyp = SegLst([_seg("s", "st0", 0.0, 2.0, "a b"),
                  _seg("s", "st1", 0.0, 2.0, "a b")])
    baseline = tcorc_wer(ref, hyp, collar=5.0, certify=False)
    monkeypatch.setattr(exact_orc, "_lib", None)
    monkeypatch.setattr(exact_orc, "_lib_tried", True)
    res = tcorc_wer(ref, hyp, collar=5.0)
    cert = res["certificate"]
    assert cert["exact"] is False
    assert cert["infeasible_blocks"] == 1 and cert["n_blocks"] == 1
    assert cert["optimum"] is None
    assert cert["matches_local_search"] is None
    assert res["errors"] == baseline["errors"]


def test_tcorc_certify_flag_off():
    ref = SegLst([_seg("s", "A", 0.0, 2.0, "a b")])
    hyp = SegLst([_seg("s", "st0", 0.0, 2.0, "a b")])
    res = tcorc_wer(ref, hyp, collar=5.0, certify=False)
    assert "certificate" not in res and res["errors"] == 0
