"""Round-4 invariants: the batched-exact BPE trainer must (a) learn the
IDENTICAL merge sequence to classic sequential BPE at a real merge count
and (b) do it in an order of magnitude fewer Spark rounds — the round-3
verdict's one remaining scale-killer (one driver round-trip per merge
would mean ~100k sequential jobs for a 100k-merge tokenizer)."""

from __future__ import annotations

import re
from collections import Counter

from database_toolbox_spark.operators.pipeline import train_bpe
from database_toolbox_spark.session import load_table
from tests.conftest import SF_DIR


def _python_bpe(texts, n_merges):
    """Independent pure-Python classic BPE (Sennrich et al. 2016): count
    adjacent symbol pairs over the frequency-weighted word table, merge
    the (count DESC, pair ASC) argmax, repeat. The oracle the distributed
    trainer must reproduce merge-for-merge."""
    freq: Counter = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if len(w) >= 2:
                freq[w] += 1
    vocab = {tuple(w): f for w, f in freq.items()}
    want = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        want.append((rank, a, b, a + b, n))
        new_vocab: dict = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return want


def test_train_bpe_batched_200_merges_exact_and_fewer_rounds(spark):
    """At 200 merges the batched trainer's sequence is byte-identical to
    sequential BPE AND uses >= 5x fewer Spark rounds than merges learned
    (the round-3 verdict's done-criterion). The 8-merge equivalence test
    in test_round3_ops covers the short head; this is the long tail where
    batching actually pays."""
    stats: dict = {}
    got = [
        (r.rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in train_bpe(spark, SF_DIR, n_merges=200, stats=stats)
        .orderBy("rank")
        .collect()
    ]
    texts = (
        load_table(spark, SF_DIR, "documents").select("text").toPandas()
    )["text"]
    want = _python_bpe(texts, 200)
    assert got == want
    # the sf0.001 corpus exhausts (every word fully fused) before 200 —
    # both implementations must stop at the SAME point
    assert stats["merges"] == len(got) >= 80
    assert stats["rounds"] * 5 <= stats["merges"], (
        f"batching too weak: {stats['rounds']} rounds for "
        f"{stats['merges']} merges"
    )
