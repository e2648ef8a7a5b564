"""Vector column math for embedding operators (``array<float>``).

Implementation notes that matter at scale:

- All expressions are UNROLLED per-dimension sums. Higher-order
  functions (``F.aggregate`` / ``zip_with``) look natural but their
  lambdas are interpreted per element — measured ~50x slower on an
  all-pairs scoring join. Unrolled arithmetic is whole-stage
  codegen'd.
- Element casts live inside each term: a shared
  ``transform(arr, cast)`` column gets inlined by CollapseProject and
  re-evaluated once per access.
- Addition is strictly left-to-right — the same order as DuckDB's
  ``list_reduce`` — so oracle doubles match bit-for-bit before
  rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DIM = 64  # embeddings.embedding dimension (FIXTURES.md §B)


def _term(a: str, b: str, i: int) -> str:
    # element_at is 1-based; CAST per element (see module docstring)
    return (
        f"(CAST(element_at({a}, {i + 1}) AS DOUBLE) * "
        f"CAST(element_at({b}, {i + 1}) AS DOUBLE))"
    )


def dot(a: str, b: str, dim: int = DIM) -> Column:
    """``a . b`` where a/b are COLUMN NAMES (optionally qualified like
    ``x.v``). Built as one SQL string -> one py4j round trip; building
    the same tree with Column operators costs hundreds of JVM calls
    (~15 s of driver time per query at dim=64)."""
    return F.expr(" + ".join(_term(a, b, i) for i in range(dim)))


def l2norm(a: str, dim: int = DIM) -> Column:
    return F.sqrt(F.expr(" + ".join(_term(a, a, i) for i in range(dim))))


# DuckDB mirror: normalized double vectors + norms per row.
COSINE_SQL_CTE = """
    vecs AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        FROM embeddings
    ),
    normed AS (
        SELECT vec_id, v,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
        FROM vecs
    )
"""
