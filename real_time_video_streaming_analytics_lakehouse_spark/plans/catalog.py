"""Central query catalog: name → (Spark plan, DuckDB oracle SQL).

Every operator row claimed in SURVEY.md §2 is represented by at least
one catalog entry. The driver runs the Spark callable and the oracle SQL
side-by-side at sf=0.01 and compares row-count + schema + value hashes
over **pandas frames** (``toPandas()`` vs DuckDB ``.df()``), capped at
the FIRST 50 registration-order entries — so the catalog holds exactly
50 queries (near-duplicate shapes are folded; each fold is noted in the
surviving query's docstring). Output discipline that keeps both engines
hash-identical (enforced by tools/check_correctness.py and
tests/test_correctness_gate.py):

* identical column aliases on both sides;
* money/measure SUMs via :func:`..functions.dialect.money_sum`
  (exact decimal-grid totals — order-independent; mirrored in SQL as
  ``CAST(SUM(CAST(x AS DECIMAL(30,s))) AS DOUBLE)``); averages divide
  that exact total by the count; pure integer ratios stay raw;
* oracle-side integer SUMs are ``CAST(... AS BIGINT)`` (DuckDB returns
  HUGEINT → pandas float64, vs Spark's int64 — a guaranteed driver
  hash mismatch);
* timestamps emitted as DATE or epoch BIGINT, never raw; no ArrayType
  outputs (stringify: ``concat_ws``/``array_to_string``); no nullable
  BOOLEAN outputs (cast to INT — Spark None vs DuckDB nan in object
  columns hash differently).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry.

    ``oracle`` is ANSI/DuckDB SQL over the pre-registered test views, or
    None for ops that are not SQL-expressible (the driver then records a
    weaker rows-only check).
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def _build() -> dict[str, QuerySpec]:
    from . import events_views, extended, llm_ops, relational

    catalog: dict[str, QuerySpec] = {}
    for mod in (relational, events_views, llm_ops, extended):
        overlap = catalog.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate catalog keys: {overlap}")
        catalog.update(mod.QUERIES)
    return catalog


CATALOG: dict[str, QuerySpec] = _build()
