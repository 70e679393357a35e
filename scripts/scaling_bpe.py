#!/usr/bin/env python
"""Scaling study for the batched-exact BPE trainer (VERDICT r4 item 6).

Two asserted claims, each a closed-form ground truth — script exits
non-zero if either fails:

1. DATA-SIZE-INDEPENDENT ROUNDS. train_bpe's per-round decisions depend
   only on RELATIVE pair/trigram counts, so a corpus that is exactly 10
   copies of sf0.1 must produce the IDENTICAL merge sequence with every
   pair_count exactly 10x — in the SAME number of Spark rounds. The
   sfbig corpus from scripts/scaling_sf1.py is that corpus for BPE:
   train_bpe splits on [^a-z]+, which strips the '_<r>' replica
   suffixes, so the word-frequency table at sfbig is exactly 10x
   sf0.1's. (Asserting equal rounds at 10x data IS the scale claim: the
   round count is a function of merge-table size, not corpus size.)

2. ROUND-COUNT ADVANTAGE AT REAL TOKENIZER DEPTH. The fixture corpus
   has a 30-word vocabulary — useless past ~200 merges — so the >=2k
   merge study runs on a SEEDED synthetic corpus with a 30k-word
   Zipf-distributed vocabulary (syllable-composed words, deterministic,
   no wall-clock/random dependence on the fixture). Assertion:
   rounds <= merges_learned / 5 (the same >=5x floor
   tests/test_round4_ops.py pins at 200 merges, now held at >=2000
   where top counts are stable and batches should fill).

Appends a section to SCALING.md. Run from repo root on an idle machine:
    python scripts/scaling_bpe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_toolbox_spark.operators.pipeline import train_bpe
from database_toolbox_spark.session import TABLES, get_spark

SF_SMALL = "/root/testdata/sf0.1"
BIG = os.environ.get("SPARK_GRAFT_SFBIG_DIR", "/tmp/sfbig")
ZIPF_DIR = os.environ.get("SPARK_GRAFT_BPE_DIR", "/tmp/bpe_corpus")

N_VOCAB = 30_000
N_DOCS = 20_000
TOKENS_PER_DOC = 150
N_MERGES_DEEP = 2_000

_SYL = [c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiou"]  # 95 syllables


def _word(i: int) -> str:
    """Deterministic syllable word for vocab rank i (3-5 syllables, so
    6-10 chars — plenty of mergeable pairs per word)."""
    n = 3 + (i % 3)
    syls = []
    x = i * 2654435761 % (1 << 32)  # Knuth multiplicative hash, public
    for _ in range(n):
        syls.append(_SYL[x % len(_SYL)])
        x = (x * 2654435761 + 12345) % (1 << 32)
    return "".join(syls)


def synthesize_zipf() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20260814)
    vocab = np.array([_word(i) for i in range(N_VOCAB)])
    ranks = np.arange(1, N_VOCAB + 1, dtype=np.float64)
    p = 1.0 / ranks**1.05
    p /= p.sum()
    ids = rng.choice(N_VOCAB, size=(N_DOCS, TOKENS_PER_DOC), p=p)
    texts = [" ".join(vocab[row]) for row in ids]
    shutil.rmtree(ZIPF_DIR, ignore_errors=True)
    os.makedirs(ZIPF_DIR, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * N_DOCS),
                "source": pa.array(
                    ["zipf%d" % (i % 4) for i in range(N_DOCS)]
                ),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int32()
                ),
            }
        ),
        f"{ZIPF_DIR}/documents.parquet",
    )
    # train_bpe only reads documents, but load_tables loads every table:
    # point the rest at sf0.1
    for t in TABLES:
        dst = f"{ZIPF_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SF_SMALL}/{t}.parquet", dst)
            os.chmod(dst, 0o644)


def main() -> int:
    failures: list[str] = []
    spark = get_spark(app_name="scaling-bpe")

    if os.environ.get("SPARK_GRAFT_BPE_DEEP_ONLY"):
        # iteration knob: rerun only claim 2 (the expensive deep run)
        return _deep_only(spark, failures)

    # --- claim 1: 10x corpus -> identical merges, 10x counts, equal rounds
    if not os.path.exists(f"{BIG}/documents.parquet"):
        from scaling_sf1 import synthesize as synth_big  # noqa: PLC0415

        synth_big()
    n_small = 200
    st_small: dict = {}
    t0 = time.perf_counter()
    m_small = [
        tuple(r)
        for r in train_bpe(spark, SF_SMALL, n_small, st_small)
        .orderBy("rank")
        .collect()
    ]
    t_small = round(time.perf_counter() - t0, 1)
    st_big: dict = {}
    t0 = time.perf_counter()
    m_big = [
        tuple(r)
        for r in train_bpe(spark, BIG, n_small, st_big)
        .orderBy("rank")
        .collect()
    ]
    t_big = round(time.perf_counter() - t0, 1)
    seq_small = [(r[0], r[1], r[2], r[3]) for r in m_small]
    seq_big = [(r[0], r[1], r[2], r[3]) for r in m_big]
    if seq_small != seq_big:
        diff = next(
            (i for i, (a, b) in enumerate(zip(seq_small, seq_big)) if a != b),
            min(len(seq_small), len(seq_big)),
        )
        failures.append(
            f"10x merge sequence diverged at rank {diff}: "
            f"small={seq_small[diff:diff+1]} big={seq_big[diff:diff+1]}"
        )
    if [r[4] * 10 for r in m_small] != [r[4] for r in m_big]:
        failures.append("10x pair_count scaling violated")
    if st_small.get("rounds") != st_big.get("rounds"):
        failures.append(
            f"round count changed with corpus size: "
            f"{st_small.get('rounds')} (sf0.1) vs {st_big.get('rounds')} (10x)"
        )

    # --- claim 2: >=2k merges on the 30k-word Zipf corpus
    if not os.path.exists(f"{ZIPF_DIR}/documents.parquet") or os.environ.get(
        "SPARK_GRAFT_BPE_REBUILD"
    ):
        synthesize_zipf()
    st_deep: dict = {}
    t0 = time.perf_counter()
    train_bpe(spark, ZIPF_DIR, N_MERGES_DEEP, st_deep).write.mode(
        "overwrite"
    ).format("noop").save()
    t_deep = round(time.perf_counter() - t0, 1)
    rounds, merges = st_deep.get("rounds", 0), st_deep.get("merges", 0)
    if merges < N_MERGES_DEEP:
        failures.append(
            f"deep corpus exhausted at {merges} merges (< {N_MERGES_DEEP}); "
            "raise vocab/doc counts"
        )
    if rounds * 5 > merges:
        failures.append(
            f"round-count floor violated at depth: {rounds} rounds for "
            f"{merges} merges (> merges/5)"
        )

    doc = {
        "replica10x": {
            "n_merges": n_small,
            "sf0.1_sec": t_small,
            "sf0.1_rounds": st_small.get("rounds"),
            "x10_sec": t_big,
            "x10_rounds": st_big.get("rounds"),
            "identical_merges": seq_small == seq_big,
        },
        "deep": {
            "corpus": f"{N_DOCS} docs x {TOKENS_PER_DOC} tokens, "
            f"{N_VOCAB}-word Zipf vocab",
            "n_merges": merges,
            "rounds": rounds,
            "merges_per_round": round(merges / max(rounds, 1), 1),
            "sec": t_deep,
        },
        "failures": failures,
    }
    print(json.dumps(doc))
    _update_scaling_md(doc)
    return 1 if failures else 0


def _deep_only(spark, failures: list[str]) -> int:
    """SPARK_GRAFT_BPE_DEEP_ONLY=1 path: claim 2 alone, no SCALING.md
    rewrite — prints the deep stats JSON for iteration."""
    if not os.path.exists(f"{ZIPF_DIR}/documents.parquet") or os.environ.get(
        "SPARK_GRAFT_BPE_REBUILD"
    ):
        synthesize_zipf()
    st: dict = {}
    t0 = time.perf_counter()
    train_bpe(spark, ZIPF_DIR, N_MERGES_DEEP, st).write.mode(
        "overwrite"
    ).format("noop").save()
    sec = round(time.perf_counter() - t0, 1)
    rounds, merges = st.get("rounds", 0), st.get("merges", 0)
    if rounds * 5 > merges:
        failures.append(f"{rounds} rounds for {merges} merges")
    print(json.dumps({"deep_rounds": rounds, "deep_merges": merges,
                      "sec": sec, "failures": failures}))
    return 1 if failures else 0


_MD_HEADER = "## BPE trainer at depth (asserted round-count bounds)"


def _update_scaling_md(doc) -> None:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    with open(path) as f:
        text = f.read()
    if _MD_HEADER in text:
        text = text[: text.index(_MD_HEADER)].rstrip() + "\n"
    r, d = doc["replica10x"], doc["deep"]
    lines = [
        "",
        _MD_HEADER,
        "",
        "Generated by `python scripts/scaling_bpe.py`. Claim 1: a corpus",
        "that is exactly 10 copies of sf0.1 (sfbig; the '_r' replica",
        "suffixes are stripped by train_bpe's [^a-z]+ split, so the word",
        "table is exactly 10x) must yield the identical merge sequence,",
        "10x pair counts, and the SAME round count — rounds are a",
        "function of merge-table size, not corpus size. Claim 2: at",
        ">=2000 merges on a 30k-word Zipf corpus the batched trainer",
        "holds the >=5x round-reduction floor the 200-merge test pins.",
        "",
        "| study | merges | rounds | merges/round | sec |",
        "|---|---|---|---|---|",
        f"| sf0.1 (base) | {r['n_merges']} | {r['sf0.1_rounds']} |"
        f" {round(r['n_merges'] / max(r['sf0.1_rounds'] or 1, 1), 1)} |"
        f" {r['sf0.1_sec']} |",
        f"| sfbig (10x rows) | {r['n_merges']} | {r['x10_rounds']} |"
        f" {round(r['n_merges'] / max(r['x10_rounds'] or 1, 1), 1)} |"
        f" {r['x10_sec']} |",
        f"| Zipf 30k-vocab deep | {d['n_merges']} | {d['rounds']} |"
        f" {d['merges_per_round']} | {d['sec']} |",
        "",
        f"Identical 10x merge sequence: {r['identical_merges']}. "
        + (
            "All BPE assertions passed."
            if not doc["failures"]
            else "FAILURES: " + "; ".join(doc["failures"])
        ),
        "",
    ]
    with open(path, "w") as f:
        f.write(text + "\n".join(lines))


if __name__ == "__main__":
    raise SystemExit(main())
