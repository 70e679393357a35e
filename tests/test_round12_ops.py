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


# ------------------------------------------------------- JPEG 4:2:0 codec


def _cdec(v, q):
    from database_toolbox_spark.functions.jpeg import (
        constant_block_decode_value,
    )

    return constant_block_decode_value(v, q)


def test_jpeg_420_constant_mcu_all_values():
    """decode(encode_420(constant 16x16 MCU)) equals the codec-free
    closed form for EVERY byte value: forward BT.601, per-table DC
    quant round-trip, inverse BT.601 — the box average and replication
    upsample are exact identities on constants."""
    from database_toolbox_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    for v in range(256):
        r, g, b = v, (3 * v + 7) % 256, (5 * v + 13) % 256
        img = decode_jpeg(
            encode_jpeg(bytes([r, g, b] * 256), 16, 16, 3,
                        subsampling="420")
        )
        y0, cb0, cr0 = rgb_to_ycbcr(r, g, b)
        want = list(
            ycbcr_to_rgb(_cdec(y0, 16), _cdec(cb0, 17), _cdec(cr0, 17))
        )
        assert img["width"] == 16 and img["height"] == 16
        assert img["pixels"] == want * 256, v


def test_jpeg_420_multi_mcu_and_odd_dims():
    """Multi-MCU strips chain DC prediction across MCUs; odd dims
    exercise edge replication in both the luma pad and the chroma
    downsample, and the decoder's crop back to the true size."""
    from database_toolbox_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    colors = [(10, 200, 30), (250, 3, 99), (128, 128, 128)]
    px = []
    for (r, g, b) in colors:
        px += [r, g, b] * 256
    img = decode_jpeg(
        encode_jpeg(bytes(px), 16, 48, 3, subsampling="420")
    )
    for t, (r, g, b) in enumerate(colors):
        y0, cb0, cr0 = rgb_to_ycbcr(r, g, b)
        want = list(
            ycbcr_to_rgb(_cdec(y0, 16), _cdec(cb0, 17), _cdec(cr0, 17))
        )
        assert img["pixels"][t * 768:t * 768 + 768] == want * 256, t

    r, g, b = 77, 150, 33
    img = decode_jpeg(
        encode_jpeg(bytes([r, g, b] * (13 * 9)), 13, 9, 3,
                    subsampling="420")
    )
    y0, cb0, cr0 = rgb_to_ycbcr(r, g, b)
    want = list(
        ycbcr_to_rgb(_cdec(y0, 16), _cdec(cb0, 17), _cdec(cr0, 17))
    )
    assert (img["width"], img["height"]) == (13, 9)
    assert img["pixels"] == want * (13 * 9)


def test_jpeg_box_down2_matches_numpy():
    """The 4:2:0 chroma reduction vs an independent numpy replay —
    half-up box average with edge replication at odd dims."""
    import numpy as np

    from database_toolbox_spark.functions.jpeg import box_down2

    rng = np.random.default_rng(7)
    for (w, h) in [(8, 8), (7, 5), (16, 9), (1, 1), (3, 8), (32, 17)]:
        plane = rng.integers(0, 256, w * h).tolist()
        a = np.array(plane).reshape(h, w)
        ae = np.pad(a, ((0, h % 2), (0, w % 2)), mode="edge")
        s = (
            ae[0::2, 0::2].astype(int) + ae[0::2, 1::2]
            + ae[1::2, 0::2] + ae[1::2, 1::2]
        )
        want = ((s + 2) // 4).flatten().tolist()
        assert box_down2(plane, w, h) == want, (w, h)


def test_jpeg_420_fuzz_nonconstant_roundtrip():
    """Non-constant 4:2:0 images: the decode must succeed with the right
    geometry, and on 2x2-flat inputs (every aligned 2x2 cell constant,
    chroma channels globally constant) the luma detail must survive —
    per-pixel luma of the decoded image within quantization error of the
    source. Exercises the box average and the MCU scan on real AC
    coefficients, which the constant-MCU oracle cannot."""
    import numpy as np

    from database_toolbox_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    for (w, h) in [(16, 16), (24, 8), (18, 34)]:
        # grayscale-valued RGB: chroma is constant 128 everywhere, luma
        # carries a random 2x2-flat pattern
        base = rng.integers(40, 216, ((h + 1) // 2, (w + 1) // 2))
        lum = np.repeat(np.repeat(base, 2, 0), 2, 1)[:h, :w]
        px = np.repeat(lum.flatten(), 3).astype(np.uint8).tobytes()
        img = decode_jpeg(encode_jpeg(px, w, h, 3, subsampling="420"))
        assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
        got = np.array(img["pixels"]).reshape(h, w, 3)
        # luma tolerance: quality-50 quantization on sharp 2x2 edges is
        # lossy; assert the reconstruction tracks the source
        y_src = (
            0.299 * lum + 0.587 * lum + 0.114 * lum
        )
        y_got = (
            0.299 * got[:, :, 0] + 0.587 * got[:, :, 1]
            + 0.114 * got[:, :, 2]
        )
        assert float(np.abs(y_got - y_src).mean()) < 12.0, (w, h)
        # chroma flatness: decoded channels stay near-gray
        assert float(
            np.abs(got[:, :, 0].astype(int) - got[:, :, 2]).mean()
        ) < 14.0


def test_jpeg_rejects_unsupported_sampling():
    """4:2:2 (0x21) sampling factors must be rejected loudly, and the
    encoder must refuse unknown subsampling names."""
    import pytest

    from database_toolbox_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(bytes(64 * 3), 8, 8, 3, subsampling="422")
    good = encode_jpeg(bytes([9, 9, 9] * 256), 16, 16, 3,
                       subsampling="420")
    # corrupt SOF: flip the luma sampling byte 0x22 -> 0x21 (4:2:2)
    i = good.find(b"\xff\xc0")
    assert i > 0
    sof = bytearray(good)
    comp0_hv = i + 2 + 2 + 1 + 4 + 1 + 1  # len, precision, h/w, ncomp, cid
    assert sof[comp0_hv] == 0x22
    sof[comp0_hv] = 0x21
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(bytes(sof))


# -------------------------------------------------- durable ANN index


def test_ivf_bq_durable_index_roundtrip(spark, tmp_path, monkeypatch):
    """With SPARK_GRAFT_ANN_PERSIST set, the first call builds the
    parquet index artifact, later calls READ it (artifact untouched),
    and the results are identical to the in-session build."""
    import os

    from database_toolbox_spark.operators.similarity import (
        ivf_bq_ann_topk,
    )

    monkeypatch.delenv("SPARK_GRAFT_ANN_PERSIST", raising=False)
    baseline = [tuple(r) for r in ivf_bq_ann_topk(spark, SF_DIR).collect()]
    assert baseline

    scratch = tmp_path / "ann"
    monkeypatch.setenv("SPARK_GRAFT_ANN_PERSIST", str(scratch))
    got1 = [tuple(r) for r in ivf_bq_ann_topk(spark, SF_DIR).collect()]
    assert got1 == baseline
    dirs = [p for p in os.listdir(scratch) if p.startswith("ivf_bq_index_")]
    assert len(dirs) == 1
    marker = scratch / dirs[0] / "_SUCCESS"
    stamp = marker.stat().st_mtime_ns

    got2 = [tuple(r) for r in ivf_bq_ann_topk(spark, SF_DIR).collect()]
    assert got2 == baseline
    assert marker.stat().st_mtime_ns == stamp, "index was rebuilt"


def test_ivf_bq_durable_index_rebuilds_on_fixture_change(
    spark, tmp_path, monkeypatch
):
    """A changed embeddings fixture changes the digest, so a new index
    artifact is built instead of a stale read."""
    import os
    import shutil

    from database_toolbox_spark.operators.similarity import (
        ivf_bq_ann_topk,
    )
    from database_toolbox_spark.session import TABLES

    sf2 = tmp_path / "sf"
    sf2.mkdir()
    for t in TABLES:
        shutil.copyfile(f"{SF_DIR}/{t}.parquet", sf2 / f"{t}.parquet")
    scratch = tmp_path / "ann"
    monkeypatch.setenv("SPARK_GRAFT_ANN_PERSIST", str(scratch))

    first = [tuple(r) for r in ivf_bq_ann_topk(spark, str(sf2)).collect()]
    assert len([p for p in os.listdir(scratch)
                if p.startswith("ivf_bq_index_")]) == 1

    # rewrite the embeddings file (same content, new mtime) -> new digest
    os.utime(sf2 / "embeddings.parquet")
    second = [tuple(r) for r in ivf_bq_ann_topk(spark, str(sf2)).collect()]
    assert second == first
    assert len([p for p in os.listdir(scratch)
                if p.startswith("ivf_bq_index_")]) == 2


def test_ann_persist_refuses_fixture_trees(monkeypatch):
    import pytest

    from database_toolbox_spark.operators.similarity import (
        _ann_index_location,
    )

    monkeypatch.setenv("SPARK_GRAFT_ANN_PERSIST", "/root/testdata/scratch")
    with pytest.raises(ValueError, match="scratch"):
        _ann_index_location(SF_DIR)
    monkeypatch.setenv("SPARK_GRAFT_ANN_PERSIST", SF_DIR)
    with pytest.raises(ValueError, match="scratch"):
        _ann_index_location(SF_DIR)


# ------------------------------------------- round-12 second tranche


def test_unigram_encode_stats_matches_python(spark):
    """Per-source encode stats replayed in plain Python: train the
    vocabulary with the same 3-iteration EM (reusing the exhaustive
    Viterbi), then segment EVERY word (len-1 words are single pieces,
    beyond-cap words counted as excluded) and roll up per source."""
    from database_toolbox_spark.operators.pipeline import (
        UNI_ITERS,
        UNI_KEEPS,
        UNI_PMAX,
        UNI_VOCAB,
        UNI_WMAX,
        unigram_encode_stats,
    )

    rows = _fetch("SELECT source, text FROM documents")
    words: Counter = Counter()
    sw: Counter = Counter()
    for (source, text) in rows:
        for w in re.split(r"[^a-z]+", text.lower()):
            if len(w) >= 1:
                sw[(source, w)] += 1
            if 2 <= len(w) <= UNI_WMAX:
                words[w] += 1

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
    for it in range(1, UNI_ITERS + 1):
        est: Counter = Counter()
        for w, f in words.items():
            best = _viterbi(w, cost6)
            for p in best[1]:
                est[p] += f
        top_multi = sorted(
            ((p, c) for p, c in est.items() if len(p) >= 2),
            key=lambda pc: (-pc[1], pc[0]),
        )[: UNI_KEEPS[it - 1]]
        keep = dict(top_multi)
        for p in cost6:
            if len(p) == 1:
                keep[p] = est.get(p, 0)
        t = sum(c for c in keep.values() if c > 0)
        cost6 = {
            p: (
                math.floor(math.log(t / c) * 1e6 + 0.501)
                if c > 0
                else cost6[p]
            )
            for p, c in keep.items()
        }

    seg = {}
    for w in {w for (_s, w) in sw}:
        if len(w) == 1:
            seg[w] = (1, 1)
        elif 2 <= len(w) <= UNI_WMAX:
            pieces = _viterbi(w, cost6)[1]
            seg[w] = (
                len(pieces), sum(1 for p in pieces if len(p) == 1)
            )

    per_src: defaultdict = defaultdict(lambda: [0, 0, 0, 0, 0])
    for (s, w), f in sw.items():
        a = per_src[s]
        a[4] += f
        if len(w) > UNI_WMAX:
            a[3] += f
        else:
            np_, n1 = seg[w]
            a[0] += f
            a[1] += f * np_
            a[2] += f * n1
    want = sorted(
        (
            s,
            a[0],
            a[1],
            rf(a[1] / a[0]),
            rf(a[2] / a[1]),
            rf(a[3] / a[4]),
        )
        for s, a in per_src.items()
    )
    got = sorted(
        tuple(r)
        for r in unigram_encode_stats(spark, SF_DIR).collect()
    )
    assert got == want


def test_fuzzy_decontamination_matches_pair_set(spark):
    """Cross-op consistency anchor: the triage rows must be exactly the
    per-eval-doc rollup of the (independently oracle-checked) verified
    near-dup pair set, split by the md5 90/5/5 buckets replayed in
    Python."""
    import hashlib

    from database_toolbox_spark.operators.dedup import (
        fuzzy_decontamination,
        minhash_near_dup_pairs,
    )

    pairs = [
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_near_dup_pairs(spark, SF_DIR).collect()
    ]

    def bucket(doc_id: int) -> str:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100
        return "train" if b < 90 else ("valid" if b < 95 else "test")

    lk: defaultdict = defaultdict(list)
    for a, b, j in pairs:
        sa, sb = bucket(a), bucket(b)
        if (sa == "train") == (sb == "train"):
            continue
        ev, tr, sp = (b, a, sb) if sa == "train" else (a, b, sa)
        lk[(ev, sp)].append((j, tr))
    want = sorted(
        (
            ev,
            sp,
            len(ms),
            max(j for j, _t in ms),
            min(t for j, t in ms if j == max(x for x, _ in ms)),
        )
        for (ev, sp), ms in lk.items()
    )
    got = sorted(
        tuple(r) for r in fuzzy_decontamination(spark, SF_DIR).collect()
    )
    assert got == want
    assert got, "fixture must contain leaked near-dup pairs"
