"""Round-11 operator tests: external anchors (numpy / pure-Python
replays) for the new tranche — the JPEG codec, the unigram-LM EM step,
and the DoReMi domain-weight update. Parity alone can't prove shared
math, so each operator's core computation is recomputed outside both
engines, and the codec gets codec-independent fuzz."""

from __future__ import annotations

import math
import random
import re
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pytest

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


# ------------------------------------------------------------- JPEG codec


def test_jpeg_constant_blocks_all_values():
    """Every byte value round-trips a constant 8x8 block to the closed
    form the SQL oracle uses — the determinism contract of the codec."""
    from database_toolbox_spark.functions.jpeg import (
        constant_block_decode_value,
        decode_jpeg,
        encode_jpeg,
    )

    for v in range(256):
        img = decode_jpeg(encode_jpeg(bytes([v] * 64), 8, 8, 1))
        assert set(img["pixels"]) == {constant_block_decode_value(v)}, v
        want = min(
            255,
            max(0, 2 * math.floor((v - 128) / 2 + 0.5) + 128),
        )
        assert constant_block_decode_value(v) == want, v


def test_jpeg_gray_fuzz_matches_numpy_replay():
    """decode(encode(x)) on arbitrary gray content (non-multiple-of-8
    dims) equals an INDEPENDENT numpy pipeline: its own DCT matrix,
    quantize, dequantize, its own IDCT, same rounding contract. This is
    what proves the Huffman/zigzag/bitstream layer is lossless and the
    only loss is quantization."""
    from database_toolbox_spark.functions.jpeg import (
        LUMA_QUANT,
        decode_jpeg,
        encode_jpeg,
    )

    # numpy's own orthonormal DCT-II matrix — not the module's tables
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    C *= np.sqrt(2 / 8)
    C[0] /= np.sqrt(2)
    Q = np.array(LUMA_QUANT, dtype=np.float64).reshape(8, 8)

    rng = random.Random(11)
    for w, h in ((24, 17), (8, 8), (16, 40), (9, 3)):
        px = [rng.randrange(256) for _ in range(w * h)]
        img = decode_jpeg(encode_jpeg(px, w, h, 1))
        assert (img["width"], img["height"]) == (w, h)
        bx, by = -(-w // 8), -(-h // 8)
        arr = np.zeros((by * 8, bx * 8))
        src = np.array(px, dtype=np.float64).reshape(h, w)
        for y in range(by * 8):
            for x in range(bx * 8):
                arr[y, x] = src[min(y, h - 1), min(x, w - 1)]
        out = np.zeros_like(arr)
        for byi in range(by):
            for bxi in range(bx):
                blk = arr[byi * 8:byi * 8 + 8, bxi * 8:bxi * 8 + 8] - 128
                coef = C @ blk @ C.T
                qd = Q * np.floor(coef / Q + 0.5 + 1e-9)
                sp = C.T @ qd @ C
                out[byi * 8:byi * 8 + 8, bxi * 8:bxi * 8 + 8] = np.clip(
                    np.floor(sp + 128 + 0.5 + 1e-9), 0, 255
                )
        flat = [int(out[y, x]) for y in range(h) for x in range(w)]
        assert flat == img["pixels"], (w, h)


def test_jpeg_rgb_roundtrip_and_fidelity():
    from database_toolbox_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    # color conversion is its own near-inverse on exactly-representable
    # grays (Cb = Cr = 128)
    for g in (0, 17, 128, 255):
        assert ycbcr_to_rgb(*rgb_to_ycbcr(g, g, g)) == (g, g, g)
    # smooth gradient survives quantization with small error
    px = []
    for y in range(16):
        for x in range(16):
            px.extend([x * 16, y * 16, 128])
    img = decode_jpeg(encode_jpeg(px, 16, 16, 3))
    assert (img["width"], img["height"], img["channels"]) == (16, 16, 3)
    mae = sum(abs(a - b) for a, b in zip(px, img["pixels"])) / len(px)
    assert mae < 6.0, mae


def test_jpeg_rejects_out_of_scope():
    from database_toolbox_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    data = bytearray(encode_jpeg(bytes([7] * 64), 8, 8, 1))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data[:20]))  # truncated before SOS
    sof = data.find(b"\xff\xc0")
    prog = bytearray(data)
    prog[sof + 1] = 0xC2  # progressive
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(prog))


def test_image_jpeg_stats_matches_python(spark):
    """Full pipeline anchor: the Spark query's decoded stats equal a
    pure-Python replay built from the parquet TEXT through the closed
    form (no JPEG anywhere in the replay)."""
    from database_toolbox_spark.operators.multimodal import (
        JPEG_BLOCKS_X,
        JPEG_CAP,
        image_jpeg_stats,
    )

    rows = _fetch("SELECT doc_id, text FROM documents ORDER BY doc_id")
    want = {}
    for doc_id, text in rows:
        body = text.encode("utf-8")[:JPEG_CAP]
        nb = max(1, len(body))
        brows = -(-nb // JPEG_BLOCKS_X)
        dec = [
            min(255, max(0, 2 * math.floor((v - 128) / 2 + 0.5) + 128))
            for v in body
        ]
        want[doc_id] = (
            JPEG_BLOCKS_X * 8,
            brows * 8,
            JPEG_BLOCKS_X * brows,
            64 * sum(dec),
            dec[0] if dec else 0,
        )
    got = {
        r.doc_id: (r.width, r.height, r.n_blocks, r.pixel_sum, r.first_px)
        for r in image_jpeg_stats(spark, SF_DIR).collect()
    }
    assert got == want


# ---------------------------------------------------- unigram-LM EM step


def test_unigram_em_matches_python(spark):
    """Independent EM replay in plain Python: word counts, substring
    seed, canon-floored integer costs, EXHAUSTIVE mask enumeration with
    the same (cost, n_pieces, mask) tie-break (a DIFFERENT algorithm
    from the query's O(L*PMAX) Viterbi fold — agreement proves the DP),
    M-step counts, and the excluded-mass ledger — then compare to the
    Spark query."""
    from database_toolbox_spark.operators.pipeline import (
        UNI_PMAX,
        UNI_TOP,
        UNI_VOCAB,
        UNI_WMAX,
        unigram_lm_em_step,
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
    vocab0 = {**chars, **multi}
    tot = sum(vocab0.values())
    cost6 = {
        p: math.floor(math.log(tot / c) * 1e6 + 0.501)
        for p, c in vocab0.items()
    }

    est: Counter = Counter()
    n_words: defaultdict = defaultdict(set)
    for w, f in words.items():
        n = len(w)
        best = None
        for mask in range(1 << (n - 1)):
            bounds = (
                [0]
                + [p for p in range(1, n) if mask & (1 << (p - 1))]
                + [n]
            )
            pieces = [
                w[bounds[i]:bounds[i + 1]]
                for i in range(len(bounds) - 1)
            ]
            if any(p not in cost6 for p in pieces):
                continue
            key = (sum(cost6[p] for p in pieces), len(pieces), mask)
            if best is None or key < best[0]:
                best = (key, pieces)
        assert best is not None, w  # chars always in vocab
        for p in best[1]:
            est[p] += f
            n_words[p].add(w)

    tot2 = sum(est.values())
    top = sorted(est.items(), key=lambda pc: (-pc[1], pc[0]))[:UNI_TOP]
    want = sorted(
        (p, c, len(n_words[p]), rf(math.log(c / tot2)))
        for p, c in top
    )
    want.append(
        ("<excluded:len>", excl_freq, len(excl_words), None)
    )
    out = [
        (r.piece, r.est_count, r.n_words, r.new_logp)
        for r in unigram_lm_em_step(spark, SF_DIR).collect()
    ]
    got = sorted(t for t in out if t[0] != "<excluded:len>")
    got.extend(t for t in out if t[0] == "<excluded:len>")
    assert got == want


# --------------------------------------------------- DoReMi domain weights


def test_doremi_matches_python_and_properties(spark):
    """Independent replay of the whole update on the exact integer grid,
    plus the two structural properties the op claims: weights sum to 1
    and the weight ratio new/old is monotone in excess loss."""
    from database_toolbox_spark.operators.curation import (
        DOREMI_ETA,
        DOREMI_SMOOTH,
        LGD_FEATURES,
        LGD_LR,
        doremi_domain_weights,
    )
    from database_toolbox_spark.operators.text import STOPWORDS

    rows = _fetch(
        "SELECT doc_id, source, lang, text FROM documents ORDER BY doc_id"
    )
    feats = []
    for _doc, source, lang, text in rows:
        toks = text.split(" ")
        y = 1.0 if lang == "en" else 0.0
        ttr = len(set(toks)) / len(toks)
        stop = sum(1 for t in toks if t in STOPWORDS) / len(toks)
        ln_ = min(len(toks) / 64.0, 2.0)
        feats.append((source, y, {"bias": 1.0, "ttr": ttr,
                                  "stop_ratio": stop, "len_norm": ln_}))

    n = len(feats)
    g = {
        f: sum(
            math.floor((0.5 - y) * x[f] * 1e6 + 0.5)
            for _s, y, x in feats
        )
        for f in LGD_FEATURES
    }
    w = {f: -LGD_LR * g[f] / (1e6 * n) for f in LGD_FEATURES}

    dom: defaultdict = defaultdict(lambda: [0, 0, 0])  # n, pos, lsum
    for source, y, x in feats:
        margin = sum(w[f] * x[f] for f in LGD_FEATURES)
        loss6 = math.floor(
            math.log(1 + math.exp(-(2 * y - 1) * margin)) * 1e6 + 0.5
        )
        d = dom[source]
        d[0] += 1
        d[1] += int(y)
        d[2] += loss6

    out = {}
    for s, (ni, pos, lsum) in dom.items():
        lbar6 = math.floor(lsum / ni + 0.5)
        if pos in (0, ni):
            href6 = 0
        else:
            p = pos / ni
            href6 = math.floor(
                -(pos * math.log(p) + (ni - pos) * math.log(1 - p))
                / ni * 1e6 + 0.5
            )
        ex6 = max(0, lbar6 - href6)
        factor6 = math.floor(math.exp(DOREMI_ETA * ex6 / 1e6) * 1e6 + 0.5)
        out[s] = (ni, lbar6, href6, ex6, factor6)

    ntot = sum(v[0] for v in out.values())
    z = sum(v[0] * v[4] for v in out.values())
    k = len(out)
    want = {
        s: (
            ni,
            rf(lbar6 / 1e6),
            rf(href6 / 1e6),
            rf(ex6 / 1e6),
            rf(ni / ntot),
            rf((1 - DOREMI_SMOOTH) * ni * factor6 / z + DOREMI_SMOOTH / k),
        )
        for s, (ni, lbar6, href6, ex6, factor6) in out.items()
    }
    res = doremi_domain_weights(spark, SF_DIR).collect()
    got = {
        r.source: (r.n_docs, r.proxy_loss, r.ref_loss, r.excess_loss,
                   r.old_share, r.new_weight)
        for r in res
    }
    assert got == want

    # property 1: the UNROUNDED weights sum to 1 (replay), and the
    # reported 6-digit weights sum to 1 within rounding slack
    exact = sum(
        (1 - DOREMI_SMOOTH) * ni * f6 / z + DOREMI_SMOOTH / k
        for ni, _a, _b, _c, f6 in out.values()
    )
    assert abs(exact - 1.0) < 1e-12
    assert abs(sum(r.new_weight for r in res) - 1.0) < 1e-5 * k

    # property 2: monotone — among equal-size domains (all sources here),
    # higher excess loss never gets a smaller new weight
    by_ex = sorted(res, key=lambda r: r.excess_loss)
    for a, b in zip(by_ex, by_ex[1:]):
        assert a.n_docs == b.n_docs  # fixture: uniform source sizes
        assert b.new_weight >= a.new_weight - 1e-9


# -------------------------------------------- matryoshka prefix-dim curve


def test_mrl_dim_recall_matches_numpy(spark):
    """Independent numpy replay: exact full-dim truth, prefix-dim
    rankings at each width with the same canon-rounded tie-break."""
    from database_toolbox_spark.operators.similarity import (
        _RECALL_K,
        MRL_DIMS,
        N_KNN_QUERIES,
        mrl_dim_recall_curve,
    )

    t = _fetch("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id")
    ids = np.array([r[0] for r in t])
    V = np.array([r[1] for r in t], dtype=np.float64)

    def topk(M, q, qid, k):
        cos = M @ q / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
        cosr = np.floor(cos * 1e6 + 0.501) / 1e6
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-cosr[i], ids[i]),
        )
        return [ids[i] for i in order[:k]]

    want = {}
    for qi in range(len(ids)):
        if ids[qi] >= N_KNN_QUERIES:
            continue
        truth = set(topk(V, V[qi], ids[qi], _RECALL_K))
        for d in MRL_DIMS:
            approx = set(topk(V[:, :d], V[qi, :d], ids[qi], _RECALL_K))
            n_hit = len(truth & approx)
            want[(d, ids[qi])] = (n_hit, rf(n_hit / _RECALL_K, 4))
    got = {
        (r.n_dims, r.qid): (r.n_hits, r.recall_at_10)
        for r in mrl_dim_recall_curve(spark, SF_DIR).collect()
    }
    assert got == want


def test_hard_negative_mining_matches_numpy(spark):
    from database_toolbox_spark.operators.similarity import (
        HN_K,
        N_KNN_QUERIES,
        hard_negative_mining,
    )

    t = _fetch(
        "SELECT vec_id, label, embedding FROM embeddings ORDER BY vec_id"
    )
    ids = np.array([r[0] for r in t])
    labels = np.array([r[1] for r in t])
    V = np.array([r[2] for r in t], dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)

    want = []
    for qi in range(len(ids)):
        if ids[qi] >= N_KNN_QUERIES:
            continue
        cos = V @ V[qi] / (norms * norms[qi])
        cosr = np.floor(cos * 1e6 + 0.501) / 1e6
        order = sorted(
            (
                i for i in range(len(ids))
                if ids[i] != ids[qi] and labels[i] != labels[qi]
            ),
            key=lambda i: (-cosr[i], ids[i]),
        )
        for rnk, i in enumerate(order[:HN_K], 1):
            want.append((ids[qi], int(labels[qi]), ids[i],
                         int(labels[i]), cosr[i], rnk))
    got = [
        (r.qid, r.qlabel, r.vec_id, r.neg_label, r.cos_sim, r.rnk)
        for r in hard_negative_mining(spark, SF_DIR).collect()
    ]
    assert got == want
    # structural: negatives never share the query's label
    assert all(q != n for _a, q, _b, n, _c, _d in got)


# ------------------------------------------- Mondrian conformal coverage


def _doc_features(text):
    from database_toolbox_spark.operators.text import STOPWORDS

    w = text.split(" ")
    n = len(w)
    return {
        "ttr": len(set(w)) / n,
        "stop_ratio": sum(1 for t in w if t in STOPWORDS) / n,
        "len_norm": min(n / 64.0, 2.0),
    }


def test_mondrian_conformal_matches_python(spark):
    import hashlib

    from database_toolbox_spark.operators.curation import (
        CONF_ALPHA,
        QC_BIAS,
        QC_W_LEN,
        QC_W_STOP,
        QC_W_TTR,
        mondrian_conformal_coverage,
    )

    rows = _fetch("SELECT doc_id, source, lang, text FROM documents")
    per = defaultdict(lambda: {"cal": [], "ev": []})
    for doc_id, source, lang, text in rows:
        f = _doc_features(text)
        logit = (QC_BIAS + QC_W_TTR * f["ttr"]
                 + QC_W_STOP * f["stop_ratio"] + QC_W_LEN * f["len_norm"])
        p = 0.5 + 0.5 * logit / (1 + abs(logit))
        y = 1 if lang == "en" else 0
        s6 = math.floor((1 - p if y else p) * 1e6 + 0.5)
        spos6 = math.floor((1 - p) * 1e6 + 0.5)
        sneg6 = math.floor(p * 1e6 + 0.5)
        fold = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4],
                   16) % 2
        bucket = "cal" if fold == 0 else "ev"
        per[source][bucket].append((s6, doc_id, spos6, sneg6))

    want = {}
    for src, d in per.items():
        cal = sorted((s6, doc_id) for s6, doc_id, _p, _n in d["cal"])
        n_cal = len(cal)
        kk = math.ceil((n_cal + 1) * (1 - CONF_ALPHA))
        qhat = cal[kk - 1][0] if kk <= n_cal else None
        ev = d["ev"]
        cov = sum(
            1 for s6, _i, _p, _n in ev if qhat is None or s6 <= qhat
        ) / len(ev)
        setsz = sum(
            (1 if qhat is None or p6 <= qhat else 0)
            + (1 if qhat is None or n6 <= qhat else 0)
            for _s, _i, p6, n6 in ev
        ) / len(ev)
        want[src] = (
            n_cal, len(ev),
            None if qhat is None else rf(qhat / 1e6),
            rf(cov), rf(setsz), rf(1 - CONF_ALPHA),
        )
    got = {
        r.source: (r.n_cal, r.n_eval, r.q_hat, r.coverage,
                   r.avg_set_size, r.target_coverage)
        for r in mondrian_conformal_coverage(spark, SF_DIR).collect()
    }
    assert got == want
    for _src, (_nc, _ne, _q, cov, setsz, _t) in got.items():
        assert 0.0 <= cov <= 1.0 and 0.0 <= setsz <= 2.0


# ------------------------------------------------ JPEG color-path stats


def test_image_jpeg_rgb_stats_matches_python(spark):
    """Full COLOR pipeline anchor: decoded per-channel sums equal a
    pure-Python replay of the closed-form chain (BT.601 forward, per-
    table DC quantization, inverse conversion) built from the parquet
    text — no JPEG in the replay."""
    from database_toolbox_spark.operators.multimodal import (
        JPEG_RGB_CAP,
        image_jpeg_rgb_stats,
    )

    def clamp(x):
        return max(0, min(255, x))

    def rhu(x):
        return math.floor(x + 0.5)

    def decq(c, q):
        fq = math.floor(8.0 * (c - 128) / float(q) + 0.5)
        return clamp(math.floor(q * fq / 8.0 + 0.5) + 128)

    rows = _fetch("SELECT doc_id, text FROM documents ORDER BY doc_id")
    want = {}
    for doc_id, text in rows:
        body = text.encode("utf-8")[:JPEG_RGB_CAP] or b"\x00"
        px = []
        for v in body:
            r, g, b = v, (3 * v + 7) % 256, (5 * v + 13) % 256
            y0 = clamp(rhu(0.299 * r + 0.587 * g + 0.114 * b))
            cb0 = clamp(rhu(128 - 0.168736 * r - 0.331264 * g + 0.5 * b))
            cr0 = clamp(rhu(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))
            y2, cb2, cr2 = decq(y0, 16), decq(cb0, 17), decq(cr0, 17)
            px.append((
                clamp(rhu(y2 + 1.402 * (cr2 - 128))),
                clamp(rhu(y2 - 0.344136 * (cb2 - 128)
                          - 0.714136 * (cr2 - 128))),
                clamp(rhu(y2 + 1.772 * (cb2 - 128))),
            ))
        want[doc_id] = (
            8, 8 * len(body), len(body),
            64 * sum(p[0] for p in px),
            64 * sum(p[1] for p in px),
            64 * sum(p[2] for p in px),
            px[0][0], px[0][1], px[0][2],
        )
    got = {
        r.doc_id: (r.width, r.height, r.n_blocks, r.r_sum, r.g_sum,
                   r.b_sum, r.first_r, r.first_g, r.first_b)
        for r in image_jpeg_rgb_stats(spark, SF_DIR).collect()
    }
    assert got == want
