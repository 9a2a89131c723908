"""Central query catalog: name → (Spark plan, DuckDB oracle SQL).

Every operator row claimed in SURVEY.md §2 is represented by at least
one catalog entry. The driver runs the Spark callable and the oracle SQL
side-by-side at sf=0.01 and compares row-count + schema + value hashes,
so every computed column is aliased identically on both sides, floats
are rounded to fixed decimals on both sides, and timestamps are emitted
as DATE or epoch BIGINT (never raw timestamps) to keep hashing
engine-neutral.
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
