"""Round-12 operator tests: external anchors for the new tranche.

The unigram trainer gets a full independent pure-Python EM replay —
3 iterations of exhaustive-Viterbi segmentation + count re-estimation +
SentencePiece-style pruning (chars never pruned, zero-count chars keep
their previous cost) — proving the chained-SQL/stepped-Spark trainer
equals an implementation that shares no code with either engine.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb

from tests.conftest import SF_DIR


def _fetch(sql: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = con.execute(sql).fetchall()
    con.close()
    return out


def rf(x, digits=6):
    return math.floor(x * 10**digits + 0.501) / 10**digits


def _viterbi(w, cost6):
    """Exhaustive (cost, n_pieces, mask) argmin over all cut masks — the
    independent spelling of the query's O(L*PMAX) packed-integer DP."""
    n = len(w)
    best = None
    for mask in range(1 << (n - 1)):
        bounds = (
            [0]
            + [p for p in range(1, n) if mask & (1 << (p - 1))]
            + [n]
        )
        pieces = [
            w[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)
        ]
        if any(p not in cost6 for p in pieces):
            continue
        key = (sum(cost6[p] for p in pieces), len(pieces), mask)
        if best is None or key < best[0]:
            best = (key, pieces)
    return best


def test_unigram_trainer_matches_python_em(spark):
    """Full trainer replay: seed vocab, then UNI_ITERS rounds of
    E-step (exhaustive Viterbi), M-step, top-K multi-char pruning with
    chars kept (zero-count chars carrying their previous cost), then
    compare the final vocabulary rows AND the excluded-mass row to the
    Spark op."""
    from database_toolbox_spark.operators.pipeline import (
        UNI_ITERS,
        UNI_KEEPS,
        UNI_PMAX,
        UNI_VOCAB,
        UNI_WMAX,
        unigram_lm_trained,
    )

    rows = _fetch("SELECT text FROM documents")
    words: Counter = Counter()
    excl_freq = 0
    excl_words: set = set()
    for (text,) in rows:
        for w in re.split(r"[^a-z]+", text.lower()):
            if 2 <= len(w) <= UNI_WMAX:
                words[w] += 1
            elif len(w) > UNI_WMAX:
                excl_freq += 1
                excl_words.add(w)

    # seed vocabulary: all single chars + top multi-char substrings
    subs: Counter = Counter()
    for w, f in words.items():
        for st in range(len(w)):
            for ln in range(1, min(UNI_PMAX, len(w) - st) + 1):
                subs[w[st:st + ln]] += f
    chars = {p: c for p, c in subs.items() if len(p) == 1}
    multi = dict(
        sorted(
            ((p, c) for p, c in subs.items() if len(p) >= 2),
            key=lambda pc: (-pc[1], pc[0]),
        )[:UNI_VOCAB]
    )
    seed = {**chars, **multi}
    tot = sum(seed.values())
    cost6 = {
        p: math.floor(math.log(tot / c) * 1e6 + 0.501)
        for p, c in seed.items()
    }

    est: Counter = Counter()
    n_words: defaultdict = defaultdict(set)
    keep_counts: dict = {}
    for it in range(1, UNI_ITERS + 1):
        # E-step + M-step under the current costs
        est = Counter()
        n_words = defaultdict(set)
        for w, f in words.items():
            best = _viterbi(w, cost6)
            assert best is not None, w
            for p in best[1]:
                est[p] += f
                n_words[p].add(w)
        # prune: top UNI_KEEPS[it-1] multi-char by est count, chars kept
        top_multi = sorted(
            ((p, c) for p, c in est.items() if len(p) >= 2),
            key=lambda pc: (-pc[1], pc[0]),
        )[: UNI_KEEPS[it - 1]]
        keep_counts = dict(top_multi)
        for p in cost6:
            if len(p) == 1:
                keep_counts[p] = est.get(p, 0)
        t = sum(c for c in keep_counts.values() if c > 0)
        new_cost = {}
        for p, c in keep_counts.items():
            if c > 0:
                new_cost[p] = math.floor(math.log(t / c) * 1e6 + 0.501)
            else:
                new_cost[p] = cost6[p]  # zero-count char keeps its cost
        cost6 = new_cost

    t = sum(c for c in keep_counts.values() if c > 0)
    want = sorted(
        (
            p,
            c,
            len(n_words.get(p, ())),
            rf(math.log(c / t)) if c > 0 else None,
        )
        for p, c in keep_counts.items()
    )
    want.append(("<excluded:len>", excl_freq, len(excl_words), None))

    out = [
        (r.piece, r.est_count, r.n_words, r.new_logp)
        for r in unigram_lm_trained(spark, SF_DIR).collect()
    ]
    got = sorted(x for x in out if x[0] != "<excluded:len>")
    got.extend(x for x in out if x[0] == "<excluded:len>")
    assert got == want


def test_unigram_trainer_prunes_and_keeps_chars(spark):
    """Structural properties of the trained vocabulary: multi-char count
    is at most the final keep budget, every single char of the word
    table survives, and positive counts dominate the vocabulary mass."""
    from database_toolbox_spark.operators.pipeline import (
        UNI_KEEPS,
        unigram_lm_trained,
    )

    rows = [
        r
        for r in unigram_lm_trained(spark, SF_DIR).collect()
        if r.piece != "<excluded:len>"
    ]
    multi = [r for r in rows if len(r.piece) >= 2]
    chars = [r for r in rows if len(r.piece) == 1]
    assert 0 < len(multi) <= UNI_KEEPS[-1]
    assert chars, "single chars must never be pruned"
    assert all(r.new_logp is None for r in rows if r.est_count == 0)
    assert all(r.new_logp is not None for r in rows if r.est_count > 0)
