#!/usr/bin/env python
"""Push the dedup/ANN flagships one scale decade past the sf~1 study:
a ~50x corpus (R=50 replicas of sf0.1) with the SAME closed-form growth
algebra, asserting the pair/candidate counts stay linear (round-7 verdict
item 6 — "asserted bounds at >=50x sf0.1 rows").

Synthesis (documents + embeddings + the orders/lineitem graph tables;
the other tables copy as-is):

- documents x50: replica r > 0 suffixes every token with `_r` — the token
  bijection preserves every within-replica Jaccard EXACTLY and makes
  cross-replica vocabularies disjoint, so the true near-dup pair set of the
  big corpus is exactly 50 copies of sf0.1's.
- embeddings x50: replica r > 0 multiplies coordinates by a seeded +-1 sign
  pattern (orthogonal transform: within-replica cosines exact,
  cross-replica ~0). Replica 0 keeps the original vec_ids, so the IVF
  centroid set (vec_id < N_IVF_CELLS) and the query vector are unchanged.

Assertions (exit non-zero on failure):
- jaccard_prefix_filter_pairs: pair count == exactly 50x (bijection truth).
- minhash_near_dup_pairs: pair count <= 1.5 * 50x + 20 (probabilistic
  banding reroll headroom, same envelope as the sf~1 study).
- ivf_ann_topk: result stays TOP_K rows AND the examined-candidate bound
  (vectors in the query's probe cell, similarity.ivf_probe_count) <=
  2 * 50x + 20 — probe work grows with the CELL SHARE of the corpus.
- ann_recall_eval / ndcg_ann_eval (round 9): the ANN QUALITY floors at
  50x — query panel invariant, mean recall@10 / NDCG@10 within 0.15 of
  sf0.1's (abs floor 0.5). Sound because sign-flip replicas preserve
  within-replica cosines and replica 0 keeps the original ids, so the
  true neighbor sets and the IVF centroid index are unchanged.
- dsir_importance_weights / rake_keyword_scores / bigram_lm_scores
  (round 9): the corpus-tracking report ops' second measured scale
  point — output shape asserted (top-K fixed / per-doc exactly 50x),
  time ratio <= 50.
- bq_bits_recall_curve (round 9): binary-quantization quality at 50x —
  panel invariant AND the 64-bit-level mean recall@10 within 0.15 of
  sf0.1's (abs floor 0.5); 16/32-bit levels recorded, not asserted.

Appends/refreshes the "sf0.1 -> sf~5" section of SCALING.md. Run from the
repo root on an idle machine: python scripts/scaling_sf5.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_toolbox_spark.operators import all_queries
from database_toolbox_spark.operators.graph import ppr_frontier_counts
from database_toolbox_spark.operators.similarity import (
    ivf_bq_probe_count,
    ivf_probe_count,
)
from database_toolbox_spark.session import TABLES, get_spark, load_tables

SF_SMALL = "/root/testdata/sf0.1"
BIG = os.environ.get("SPARK_GRAFT_SF5_DIR", "/tmp/sf5big")
R = 50
SHIFT = 10_000_000

SUSPECTS = [
    ("jaccard_prefix_filter_pairs", "exact"),
    ("minhash_near_dup_pairs", "linear"),
    ("ivf_ann_topk", "probe"),
    # round-9: ANN QUALITY at 50x (verdict item 5) — the sign-flip
    # replicas preserve within-replica cosines and replica 0 keeps the
    # original vec_ids, so the query panel's true neighbors stay
    # computable and the IVF index (centroids = replica-0 ids) is
    # unchanged. evalfloor = per-query panel row count invariant AND the
    # mean metric at 50x within EVAL_DROP of sf0.1's (replica vectors may
    # enter probe cells as near-orthogonal interlopers; a structural
    # recall collapse blows the floor).
    ("ann_recall_eval", "evalfloor"),
    ("ndcg_ann_eval", "evalfloor"),
    # round-9: the report-mode corpus-size ops (verdict item 4) get their
    # second measured scale point here. report50 = output row count
    # invariant (top-20 / fixed source panel) AND time ratio within the
    # linear envelope at 50x rows (~65x bytes).
    ("dsir_importance_weights", "report50"),
    ("rake_keyword_scores", "report50"),
    ("bigram_lm_scores", "report50"),
    # round-9: binary-quantization quality at 50x. Replica vectors carry
    # sign-mask-flipped codes, so their Hamming distance to the replica-0
    # query panel is ~Binomial(64, 1/2) noise while replica-0 candidates
    # keep their original distances — the 64-bit shortlist must stay
    # truth-dominated. bqfloor = panel row count invariant AND the
    # 64-bit-level mean recall@10 within EVAL_DROP of sf0.1's (abs floor
    # 0.5); the 16/32-bit levels are RECORDED, not asserted — coarse
    # codes legitimately drown in ties at 50x, which is exactly the
    # sizing signal the curve exists to show.
    ("bq_bits_recall_curve", "bqfloor"),
    # round-10 (verdict item 6): asymmetric scoring must LIFT the coarse
    # bit budgets the symmetric curve loses at 50x. asymfloor = bqfloor's
    # 64-bit check PLUS the 32-bit level mean recall@10 >= ASYM32_FLOOR —
    # the float query against the same code bytes (numpy prototype at
    # 50x: 32-bit 0.37 sym -> 0.63 asym, 64-bit 0.75 -> 0.95).
    ("bq_asym_recall_curve", "asymfloor"),
    # round-11 (round-10 verdict item 1a): the composite IVF->asym-binary
    # ->exact-rerank ladder gets its own probe + quality row. ivfbq =
    # top-k row count invariant AND the probe-cell code-row count
    # (similarity.ivf_bq_probe_count — the ONLY rows the asym scan and
    # the rank-filter shortlist touch) within 2x of linear AND the mean
    # exact cosine of the returned top-k within EVAL_DROP of sf0.1's
    # (abs floor IVFBQ_COS_FLOOR) — replica 0 keeps the original ids and
    # centroids, so the true in-cell neighbors are unchanged and
    # sign-flip interlopers are near-orthogonal noise the rerank must
    # reject.
    ("ivf_bq_ann_topk", "ivfbq"),
    # round-11 (round-10 verdict item 1b): personalized PageRank's
    # frontier-sparsity claim, MEASURED. The 50x graph replicas (orders +
    # lineitem with keys shifted by r*SHIFT) are 50 disjoint copies of
    # the supplier<->customer graph; the seed (min node 'c0') stays in
    # replica 0, so the walk cannot leave it. frontier = per-iteration
    # rank-vector node counts (graph.ppr_frontier_counts) IDENTICAL to
    # sf0.1's — touched nodes track the seed's reach while the corpus is
    # 50x — AND the top-20 row count invariant.
    ("personalized_pagerank", "frontier"),
    # round-12 (round-11 verdict item 1): the ANN-training-data ops get
    # their panel-invariance rows under the same sign-flip replicas.
    # mrlfloor = per-(dim, query) panel row count invariant AND the
    # FULL-width (32-dim) level's mean recall@10 at 50x within EVAL_DROP
    # of sf0.1's (abs floor 0.5) — narrower prefixes are RECORDED, not
    # asserted: at 8 of 64 dims the chance-cosine variance of sign-flip
    # interlopers is exactly the sizing signal the curve exists to show.
    # hnmono = top-{HN_K}-per-query row count invariant AND the mean
    # exact cosine of the mined hard negatives MONOTONE non-decreasing
    # at 50x: the candidate pool is a superset, so a drop can only mean
    # the panel or ranking broke.
    ("mrl_dim_recall_curve", "mrlfloor"),
    ("hard_negative_mining", "hnmono"),
]
IVFBQ_COS_FLOOR = 0.3
ASYM32_FLOOR = 0.5

# evalfloor: mean-metric column per query, max allowed drop vs sf0.1, and
# the absolute floor under it.
EVAL_METRIC = {"ann_recall_eval": "recall_at_10",
               "ndcg_ann_eval": "ndcg_at_10"}
EVAL_DROP = 0.15
EVAL_ABS_FLOOR = 0.5
# report50: linear-envelope time bound at 50x (fixed-cost amortization
# keeps measured ratios well under this; a super-linear op blows past it).
REPORT50_TIME = 50.0
# report50 row expectation: top-K reports stay fixed-size; per-doc
# reports are exactly 50x under the token-bijection replicas.
REPORT50_ROWS = {
    "dsir_importance_weights": "fixed",
    "rake_keyword_scores": "fixed",
    "bigram_lm_scores": "x50",
}


def synthesize() -> None:
    import duckdb

    shutil.rmtree(BIG, ignore_errors=True)
    os.makedirs(BIG, exist_ok=True)
    con = duckdb.connect()
    rep = f"(SELECT unnest(range({R})) AS r) rr"
    con.execute(
        f"""
        COPY (
          SELECT doc_id, text, lang, source, length(text) AS n_chars
          FROM (
            SELECT d.doc_id + rr.r * {SHIFT} AS doc_id,
                   CASE WHEN rr.r = 0 THEN d.text
                        ELSE array_to_string(
                            list_transform(string_split(d.text, ' '),
                                           t -> t || '_' || rr.r), ' ')
                   END AS text,
                   d.lang, d.source
            FROM read_parquet('{SF_SMALL}/documents.parquet') d
            CROSS JOIN {rep}
          )
        ) TO '{BIG}/documents.parquet' (FORMAT PARQUET)
        """
    )

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(f"{SF_SMALL}/embeddings.parquet").to_pandas()
    dim = len(base["embedding"].iloc[0])
    vec_ids, embs, labels = [], [], []
    for r in range(R):
        signs = (
            np.ones(dim, dtype=np.float32)
            if r == 0
            else np.random.default_rng(r)
            .choice([-1.0, 1.0], dim)
            .astype(np.float32)
        )
        for vid, emb, lab in zip(
            base["vec_id"], base["embedding"], base["label"]
        ):
            vec_ids.append(int(vid) + r * SHIFT)
            embs.append(
                (np.asarray(emb, dtype=np.float32) * signs).tolist()
            )
            labels.append(int(lab))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "embedding": pa.array(embs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{BIG}/embeddings.parquet",
    )

    # 50x graph replicas for the PPR frontier row: orders + lineitem with
    # the three graph keys shifted by r*SHIFT — 50 DISJOINT copies of the
    # supplier<->customer graph (all other columns verbatim). Replica 0
    # keeps the original keys, so the seed ('c0' — every replicated key
    # starts with digit 1..4 and sorts after it) and its component are
    # unchanged.
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (o_orderkey + rr.r * {SHIFT} AS o_orderkey,
                            o_custkey + rr.r * {SHIFT} AS o_custkey)
          FROM read_parquet('{SF_SMALL}/orders.parquet')
          CROSS JOIN {rep}
        ) TO '{BIG}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (l_orderkey + rr.r * {SHIFT} AS l_orderkey,
                            l_suppkey + rr.r * {SHIFT} AS l_suppkey)
          FROM read_parquet('{SF_SMALL}/lineitem.parquet')
          CROSS JOIN {rep}
        ) TO '{BIG}/lineitem.parquet' (FORMAT PARQUET)
        """
    )

    for t in TABLES:
        dst = f"{BIG}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SF_SMALL}/{t}.parquet", dst)
            os.chmod(dst, 0o644)


def measure(spark, queries, sf_dir):
    from database_toolbox_spark.session import release_materialized

    for df in load_tables(spark, sf_dir).values():
        df.limit(1).write.mode("overwrite").format("noop").save()
    out = {}
    for name, mode in SUSPECTS:
        # release the previous suspect's checkpoint blocks BEFORE building
        # the next one (round-12 verdict item 2): without this, 13
        # suspects' accumulated blocks OOMed the big phase at 8g and the
        # study needed a fresh session per phase; release makes one
        # session serve both phases. (Release-before-build, not
        # after-measure: the df is still collected below.)
        release_materialized(spark)
        df = queries[name](spark, sf_dir)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        if mode == "evalfloor":
            collected = df.collect()
            out[name] = {"sec": round(best, 3), "rows": len(collected)}
            col = EVAL_METRIC[name]
            out[name]["mean_metric"] = round(
                sum(r[col] for r in collected) / max(len(collected), 1), 4
            )
        elif mode in ("bqfloor", "asymfloor"):
            collected = df.collect()
            out[name] = {"sec": round(best, 3), "rows": len(collected)}
            by_bits: dict[int, list[float]] = {}
            for r in collected:
                by_bits.setdefault(r.n_bits, []).append(r.recall_at_10)
            out[name]["level_means"] = {
                int(b): round(sum(v) / len(v), 4)
                for b, v in sorted(by_bits.items())
            }
        elif mode == "ivfbq":
            collected = df.collect()
            out[name] = {"sec": round(best, 3), "rows": len(collected)}
            out[name]["mean_metric"] = round(
                sum(r.cos_sim for r in collected)
                / max(len(collected), 1), 4
            )
            out[name]["probe"] = ivf_bq_probe_count(spark)
        elif mode == "frontier":
            out[name] = {"sec": round(best, 3), "rows": df.count()}
            out[name]["frontier"] = ppr_frontier_counts(spark, sf_dir)
        elif mode == "mrlfloor":
            collected = df.collect()
            out[name] = {"sec": round(best, 3), "rows": len(collected)}
            by_dim: dict[int, list[float]] = {}
            for r in collected:
                by_dim.setdefault(r.n_dims, []).append(r.recall_at_10)
            out[name]["level_means"] = {
                int(d): round(sum(v) / len(v), 4)
                for d, v in sorted(by_dim.items())
            }
        elif mode == "hnmono":
            collected = df.collect()
            out[name] = {"sec": round(best, 3), "rows": len(collected)}
            out[name]["mean_metric"] = round(
                sum(r.cos_sim for r in collected)
                / max(len(collected), 1), 6
            )
        else:
            out[name] = {"sec": round(best, 3), "rows": df.count()}
        if mode == "probe":
            out[name]["probe"] = ivf_probe_count(spark)
    return out


def main() -> int:
    if not os.path.exists(f"{BIG}/documents.parquet") or os.environ.get(
        "SPARK_GRAFT_SF5_REBUILD"
    ):
        synthesize()
    # 50x corpora: ONE session serves both phases now that measure()
    # releases each suspect's checkpoint blocks via
    # session.release_materialized (round-12 verdict item 2 — the old
    # fresh-session-per-phase workaround existed because accumulated
    # blocks OOMed the big phase at 8g). The larger default heap stays:
    # a single 50x suspect's working set is legitimately bigger than the
    # 8g query-session default.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(app_name="scaling-sf5")
    queries = all_queries()
    small = measure(spark, queries, SF_SMALL)
    big = measure(spark, queries, BIG)
    failures = []
    rows_out = {}
    for name, mode in SUSPECTS:
        s, b = small[name], big[name]
        rows_out[name] = {
            "sf0.1_sec": s["sec"],
            "sf5_sec": b["sec"],
            "time_ratio": round(b["sec"] / max(s["sec"], 1e-9), 2),
            "sf0.1_rows": s["rows"],
            "sf5_rows": b["rows"],
            "mode": mode,
        }
        if mode == "exact" and b["rows"] != R * s["rows"]:
            failures.append(
                f"{name}: expected exactly {R}x rows "
                f"({R * s['rows']}), got {b['rows']}"
            )
        elif mode == "linear" and b["rows"] > 1.5 * R * s["rows"] + 20:
            failures.append(
                f"{name}: {b['rows']} rows exceeds linear headroom "
                f"(1.5 * {R} * {s['rows']} + 20)"
            )
        elif mode == "probe":
            rows_out[name]["probe_small"] = s["probe"]
            rows_out[name]["probe_big"] = b["probe"]
            if b["rows"] != s["rows"]:
                failures.append(
                    f"{name}: top-k row count changed "
                    f"{s['rows']} -> {b['rows']}"
                )
            if b["probe"] > 2 * R * s["probe"] + 20:
                failures.append(
                    f"{name}: probe-cell candidates {b['probe']} exceed "
                    f"linear headroom (2 * {R} * {s['probe']} + 20)"
                )
        elif mode == "evalfloor":
            rows_out[name]["mean_small"] = s["mean_metric"]
            rows_out[name]["mean_big"] = b["mean_metric"]
            if b["rows"] != s["rows"]:
                failures.append(
                    f"{name}: query-panel row count changed "
                    f"{s['rows']} -> {b['rows']}"
                )
            floor = max(EVAL_ABS_FLOOR, s["mean_metric"] - EVAL_DROP)
            if b["mean_metric"] < floor:
                failures.append(
                    f"{name}: mean {EVAL_METRIC[name]} fell to "
                    f"{b['mean_metric']} at {R}x (floor {floor}: sf0.1 "
                    f"mean {s['mean_metric']} - {EVAL_DROP}, abs "
                    f"{EVAL_ABS_FLOOR})"
                )
        elif mode in ("bqfloor", "asymfloor"):
            rows_out[name]["mean_small"] = s["level_means"]
            rows_out[name]["mean_big"] = b["level_means"]
            if b["rows"] != s["rows"]:
                failures.append(
                    f"{name}: panel row count changed "
                    f"{s['rows']} -> {b['rows']}"
                )
            top = max(s["level_means"])
            floor = max(EVAL_ABS_FLOOR, s["level_means"][top] - EVAL_DROP)
            if b["level_means"][top] < floor:
                failures.append(
                    f"{name}: {top}-bit mean recall fell to "
                    f"{b['level_means'][top]} at {R}x (floor {floor})"
                )
            if mode == "asymfloor" and b["level_means"][32] < ASYM32_FLOOR:
                failures.append(
                    f"{name}: 32-bit asymmetric mean recall "
                    f"{b['level_means'][32]} below {ASYM32_FLOOR} at {R}x"
                )
        elif mode == "ivfbq":
            rows_out[name]["probe_small"] = s["probe"]
            rows_out[name]["probe_big"] = b["probe"]
            rows_out[name]["mean_small"] = s["mean_metric"]
            rows_out[name]["mean_big"] = b["mean_metric"]
            if b["rows"] != s["rows"]:
                failures.append(
                    f"{name}: top-k row count changed "
                    f"{s['rows']} -> {b['rows']}"
                )
            if b["probe"] > 2 * R * s["probe"] + 20:
                failures.append(
                    f"{name}: probe-cell code rows {b['probe']} exceed "
                    f"linear headroom (2 * {R} * {s['probe']} + 20)"
                )
            floor = max(IVFBQ_COS_FLOOR, s["mean_metric"] - EVAL_DROP)
            if b["mean_metric"] < floor:
                failures.append(
                    f"{name}: mean exact cosine of the top-k fell to "
                    f"{b['mean_metric']} at {R}x (floor {floor}: sf0.1 "
                    f"mean {s['mean_metric']} - {EVAL_DROP}, abs "
                    f"{IVFBQ_COS_FLOOR})"
                )
        elif mode == "frontier":
            rows_out[name]["frontier_small"] = s["frontier"]
            rows_out[name]["frontier_big"] = b["frontier"]
            if b["rows"] != s["rows"]:
                failures.append(
                    f"{name}: top-20 row count changed "
                    f"{s['rows']} -> {b['rows']}"
                )
            if b["frontier"] != s["frontier"]:
                failures.append(
                    f"{name}: per-iteration frontier counts changed "
                    f"{s['frontier']} -> {b['frontier']} — the rank "
                    f"vector touched nodes outside the seed's reach"
                )
        elif mode == "mrlfloor":
            rows_out[name]["mean_small"] = s["level_means"]
            rows_out[name]["mean_big"] = b["level_means"]
            if b["rows"] != s["rows"]:
                failures.append(
                    f"{name}: panel row count changed "
                    f"{s['rows']} -> {b['rows']}"
                )
            top = max(s["level_means"])
            # the panel's top level is a HALF-width prefix (32 of 64 dims
            # — full-dim recall of itself is 1 by definition, so the
            # curve has no 64 row), and a half-width prefix's ABSOLUTE
            # recall is corpus-size-dependent confusability (49x
            # sign-flip interlopers crowd the top-10) — exactly what the
            # curve exists to show. So the EVAL_ABS_FLOOR only applies
            # when the sf0.1 mean itself clears it (ann_recall-style
            # near-1 levels); otherwise the relative EVAL_DROP band is
            # the assertion. Round-12 wrote max(abs, rel) but never got
            # a completed run (the pre-release-materialized study OOMed);
            # the first full run measured small=0.22 -> an unreachable
            # 0.5 floor.
            floor = s["level_means"][top] - EVAL_DROP
            if s["level_means"][top] >= EVAL_ABS_FLOOR:
                floor = max(floor, EVAL_ABS_FLOOR)
            if b["level_means"][top] < floor:
                failures.append(
                    f"{name}: {top}-dim mean recall fell to "
                    f"{b['level_means'][top]} at {R}x (floor {floor})"
                )
        elif mode == "hnmono":
            rows_out[name]["mean_small"] = s["mean_metric"]
            rows_out[name]["mean_big"] = b["mean_metric"]
            if b["rows"] != s["rows"]:
                failures.append(
                    f"{name}: panel row count changed "
                    f"{s['rows']} -> {b['rows']}"
                )
            if b["mean_metric"] < s["mean_metric"] - 1e-6:
                failures.append(
                    f"{name}: mean mined-negative cosine FELL "
                    f"{s['mean_metric']} -> {b['mean_metric']} at {R}x "
                    f"(candidate superset can only raise it)"
                )
        elif mode == "report50":
            want = (s["rows"] if REPORT50_ROWS[name] == "fixed"
                    else R * s["rows"])
            if b["rows"] != want:
                failures.append(
                    f"{name}: expected {REPORT50_ROWS[name]} rows "
                    f"({want}), got {b['rows']}"
                )
            if rows_out[name]["time_ratio"] > REPORT50_TIME:
                failures.append(
                    f"{name}: time ratio {rows_out[name]['time_ratio']} "
                    f"exceeds linear envelope {REPORT50_TIME} at {R}x rows"
                )
    doc = {
        "sf_small": 0.1,
        "sf_big": f"~5 ({R}x synthetic, known growth algebra)",
        "queries": rows_out,
        "failures": failures,
    }
    print(json.dumps(doc))
    _update_scaling_md(rows_out, failures)
    return 1 if failures else 0


_MD_HEADER = "## sf0.1 -> sf~5 (50x synthetic, asserted growth algebra)"


def _update_scaling_md(rows_out, failures) -> None:
    from _scaling_md import replace_section

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    lines = [
        "",
        "Generated by `python scripts/scaling_sf5.py` — the dedup/ANN",
        "flagships one scale decade past the sf~1 study, same closed-form",
        "growth algebra (token-bijection document replicas, sign-flip",
        "embedding replicas; replica 0 keeps the original vec_ids so the",
        "IVF centroids and query are unchanged). exact = pair count must",
        "equal 50x; linear = banding-reroll headroom 1.5x; probe = top-k",
        "row count invariant AND probe-cell candidate count within 2x of",
        "linear (the examined-candidate work bound); evalfloor = query",
        "panel invariant AND mean recall@10 / NDCG@10 at 50x within 0.15",
        "of sf0.1's (abs floor 0.5) — the ANN QUALITY assertion at scale;",
        "report50 = output shape asserted (top-K fixed / per-doc exactly",
        "50x) AND time ratio <= 50",
        "(the linear envelope for the corpus-tracking report ops);",
        "ivfbq = top-k invariant AND probe-cell code rows within 2x of",
        "linear AND mean exact top-k cosine within 0.15 of sf0.1's (abs",
        "floor 0.3) — the composite IVF->asym-binary->rerank ladder's",
        "probe + quality row; frontier = top-20 invariant AND the PPR",
        "rank vector's per-iteration node counts IDENTICAL under 50",
        "disjoint graph replicas (orders/lineitem keys shifted) — the",
        "frontier-sparsity claim measured, not narrated; mrlfloor =",
        "matryoshka panel invariant AND full-width mean recall@10",
        "within 0.15 (abs floor 0.5), narrow prefixes recorded;",
        "hnmono = hard-negative panel invariant AND mean mined-negative",
        "cosine monotone non-decreasing (candidate superset).",
        "",
        "| query | mode | sf0.1 s | sf~5 s | time ratio | sf0.1 rows |"
        " sf~5 rows | probe/mean small | probe/mean big |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, r in rows_out.items():
        if r["mode"] == "ivfbq":
            aux_s = f"probe={r['probe_small']} cos={r['mean_small']}"
            aux_b = f"probe={r['probe_big']} cos={r['mean_big']}"
        elif r["mode"] == "frontier":
            aux_s = "frontier=" + "/".join(map(str, r["frontier_small"]))
            aux_b = "frontier=" + "/".join(map(str, r["frontier_big"]))
        else:
            aux_s = r.get("probe_small", r.get("mean_small", ""))
            aux_b = r.get("probe_big", r.get("mean_big", ""))
        lines.append(
            f"| {name} | {r['mode']} | {r['sf0.1_sec']} | {r['sf5_sec']} |"
            f" {r['time_ratio']} | {r['sf0.1_rows']} | {r['sf5_rows']} |"
            f" {aux_s} | {aux_b} |"
        )
    lines.append("")
    lines.append(
        "All growth assertions passed."
        if not failures
        else "FAILURES: " + "; ".join(failures)
    )
    replace_section(path, _MD_HEADER, lines)


if __name__ == "__main__":
    raise SystemExit(main())
