"""Standalone Arrow-batch kernel for char_entropy_scores.

Lives in its own module (the png/wav kernel pattern) so
`cloudpickle.register_pickle_by_value` ships ONLY this kernel to
executors — round-9 ADVICE: registering the whole operators.text module
serialized STOPWORDS and every SQL builder with each UDF, on every
invocation. text.py registers this module once, behind an idempotent
guard.
"""

from __future__ import annotations


def _char_entropy_batch(texts):
    """Vectorized per-document character histogram + Shannon entropy over
    one Arrow batch. Codepoint stream = utf-32 view of the concatenated
    batch; (doc << 21 | codepoint) keys (codepoints < 2^21) make ONE
    np.unique call produce every per-doc character count; two bincounts
    aggregate them back per doc. O(batch_bytes · log batch_bytes), all
    numpy. The final floor(x·1e4 + 0.501)/1e4 is functions.canon_round —
    the same grid the DuckDB oracle applies."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    n = len(texts)
    if n == 0:
        return pd.DataFrame(
            {"n_chars": [], "distinct_chars": [], "char_entropy_bits": []}
        )
    vals = texts.tolist()
    lens = np.fromiter((len(s) for s in vals), np.int64, n)
    cp = np.frombuffer(
        "".join(vals).encode("utf-32-le"), np.uint32
    ).astype(np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    uk, cnt = np.unique((doc << 21) | cp, return_counts=True)
    udoc = uk >> 21
    # H = log2(N) - (1/N)·sum(n_i·log2(n_i)) == -sum(p_i·log2(p_i))
    acc = np.bincount(udoc, weights=cnt * np.log2(cnt), minlength=n)
    dc = np.bincount(udoc, minlength=n)
    safe = np.maximum(lens, 1)
    ent = np.where(lens > 0, np.log2(safe) - acc / safe, 0.0)
    ent = np.floor(ent * 1e4 + 0.501) / 1e4
    return pd.DataFrame(
        {"n_chars": lens, "distinct_chars": dc, "char_entropy_bits": ent}
    )
