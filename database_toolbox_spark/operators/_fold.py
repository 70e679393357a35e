"""Unrolled, codegen-friendly twins of the hot array-lambda folds.

Spark's higher-order functions (``aggregate``, ``zip_with``, ``transform``)
are CodegenFallback expressions: every element evaluation goes through the
interpreted expression path with per-element lambda-variable binding, so a
64-dim dot product inside a pair join dominates the stage (guide §4.1 —
prefer built-ins/codegen over interpreted paths).

These helpers emit the SAME arithmetic as the lambda folds they replace —
a left-associated chain starting from ``CAST(0 AS DOUBLE)``, one IEEE
double add/multiply per element in the identical order — so results are
bit-for-bit identical to ``aggregate(zip_with(...))`` while executing in
WholeStageCodegen. The leading ``0 +`` is kept deliberately: ``aggregate``
starts its fold at the zero accumulator, and dropping it would flip the
sign of an (all -0.0)-product corner case.

Only for FIXED, known dims, and only SMALL ones: the unrolled expression
is the loop, so the dim must be a compile-time constant, and the
measured boundary is ~16 terms — the 8-dim PQ subspace L2 and the
16-term DFT sums win, while 64-dim embedding folds measured ~2x SLOWER
unrolled (the generated trees fall out of JIT-compilable method sizes;
the 64-dim variants were removed after same-window A/B — see
OPTIMIZATION_r12.md "unroll boundary"). unrolled_norm2's default
dim=64 survives only for jl_projection_stats, where it measured
neutral-to-positive inside a single scan-side projection.
"""

from __future__ import annotations

from typing import Callable


def unrolled_sum(term: Callable[[int], str], dim: int, start: int = 1) -> str:
    """Bit-exact twin of
    aggregate(sequence(start, start+dim-1), CAST(0 AS DOUBLE),
              (acc, i) -> acc + term(i)):
    the same left-associated IEEE addition chain from the zero
    accumulator, with the loop index inlined as a literal."""
    terms = " + ".join(term(i) for i in range(start, start + dim))
    return f"(CAST(0 AS DOUBLE) + {terms})"


def unrolled_norm2(e: str, dim: int = 64) -> str:
    """Bit-exact twin of
    aggregate(e, CAST(0 AS DOUBLE),
              (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))."""
    terms = " + ".join(
        f"CAST(element_at({e}, {i}) AS DOUBLE)"
        f" * CAST(element_at({e}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return f"(CAST(0 AS DOUBLE) + {terms})"


def unrolled_l2_idx(vec: str, base: str, cemb: str, dim: int) -> str:
    """Bit-exact twin of
    aggregate(zip_with(slice({vec}, 1 + {base}, dim), {cemb}, (x, y) ->
                  (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                  * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
              CAST(0 AS DOUBLE), (acc, x) -> acc + x)
    with the subvector indexed DIRECTLY off the full vector (no slice
    allocation): element i of the slice is element_at(vec, base + i)."""
    terms = " + ".join(
        f"(CAST(element_at({vec}, {base} + {i}) AS DOUBLE)"
        f" - CAST(element_at({cemb}, {i}) AS DOUBLE))"
        f" * (CAST(element_at({vec}, {base} + {i}) AS DOUBLE)"
        f" - CAST(element_at({cemb}, {i}) AS DOUBLE))"
        for i in range(1, dim + 1)
    )
    return f"(CAST(0 AS DOUBLE) + {terms})"
