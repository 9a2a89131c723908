"""Data-quality validation.

The reference's ``DataQualityValidator`` (``spark-jobs/etl_framework.py:
125-206``) issues one ``count()`` action per rule — N full scans. This
engine computes the whole profile in ONE aggregation pass
(``sum(when(...))`` fan-out), which is the difference between 1 scan and
N scans of 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_summary(
    df: DataFrame,
    not_null_cols: list[str],
    id_col: str,
    future_ts_col: str | None = None,
    as_of: str | None = None,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Single-pass data-quality profile.

    Returns one row: total_rows, per-column null counts
    (``null_<col>``), future-timestamp count, duplicate-id count, and
    ``valid_pct`` (rows with every checked column non-null).

    ``extra_aggs`` appends caller-supplied aggregate Columns to the
    SAME pass (after ``valid_pct``), so a profile that also needs
    domain counters stays one scan instead of a profile-scan plus a
    crossJoined counter-scan.
    """

    def cnt(pred: Column) -> Column:
        return F.count(F.when(pred, F.lit(1)))

    aggs: list[Column] = [F.count("*").alias("total_rows")]
    for c in not_null_cols:
        aggs.append(cnt(F.col(c).isNull()).alias(f"null_{c}"))
    if future_ts_col is not None and as_of is not None:
        aggs.append(
            cnt(F.col(future_ts_col) > F.lit(as_of).cast("timestamp_ntz")).alias(
                "future_ts"
            )
        )
    aggs.append(
        (F.count("*") - F.count_distinct(F.col(id_col))).alias("duplicate_ids")
    )
    any_null = None
    for c in not_null_cols:
        p = F.col(c).isNull()
        any_null = p if any_null is None else (any_null | p)
    aggs.append(
        F.round(
            (F.count("*") - cnt(any_null)) * 100.0 / F.count("*"), 4
        ).alias("valid_pct")
    )
    if extra_aggs:
        aggs.extend(extra_aggs)
    return df.agg(*aggs)


class DQRuleSet:
    """Pluggable data-quality rule registry, compiled to ONE pass.

    The reference's ``DataQualityValidator`` registers per-column Python
    rules (``etl_framework.py:111-123``) and then issues one ``count()``
    action per rule — N scans. This registry keeps the extension point
    (register arbitrary named rules) but compiles every registered rule
    into a single ``sum(when(...))`` aggregation, so the profile costs
    one scan regardless of rule count.

    A rule is a *violation predicate*: a Column that is true for rows
    failing the rule.

    >>> rules = DQRuleSet().not_null("user_id").add_rule(
    ...     "value", "non_negative", F.col("value") < 0)
    >>> rules.summary(df)    # 1 row: total_rows, viol_*, valid_pct
    >>> rules.annotate(df)   # df + _dq_valid, _dq_errors (projection)
    """

    def __init__(self) -> None:
        self._rules: dict[str, Column] = {}

    def add_rule(
        self, column: str, rule_name: str, violation: Column
    ) -> "DQRuleSet":
        """Register ``violation`` (true = row fails) under
        ``<column>.<rule_name>``. Returns self for chaining."""
        self._rules[f"{column}.{rule_name}"] = violation
        return self

    # -- common-rule conveniences (mirror the reference's built-ins) --

    def not_null(self, column: str) -> "DQRuleSet":
        return self.add_rule(column, "not_null", F.col(column).isNull())

    def in_range(self, column: str, lo, hi) -> "DQRuleSet":
        c = F.col(column)
        return self.add_rule(
            column, "in_range", c.isNull() | (c < lo) | (c > hi)
        )

    def matches(self, column: str, regex: str) -> "DQRuleSet":
        c = F.col(column)
        return self.add_rule(
            column, "matches", c.isNull() | ~c.rlike(regex)
        )

    def not_future(self, column: str, as_of: str) -> "DQRuleSet":
        return self.add_rule(
            column,
            "not_future",
            F.col(column) > F.lit(as_of).cast("timestamp_ntz"),
        )

    @property
    def rule_names(self) -> list[str]:
        return list(self._rules)

    def summary(self, df: DataFrame) -> DataFrame:
        """One-row violation profile — a single aggregation pass.

        Columns: ``total_rows``, one ``viol_<column>_<rule>`` count per
        registered rule, and ``valid_pct`` (rows violating nothing).
        """
        if not self._rules:
            raise ValueError("no rules registered")

        def cnt(pred: Column) -> Column:
            return F.count(F.when(pred, F.lit(1)))

        aggs = [F.count("*").alias("total_rows")]
        any_viol = None
        for name, pred in self._rules.items():
            safe = name.replace(".", "_")
            aggs.append(cnt(pred).alias(f"viol_{safe}"))
            any_viol = pred if any_viol is None else (any_viol | pred)
        aggs.append(
            F.round(
                (F.count("*") - cnt(any_viol)) * 100.0 / F.count("*"), 4
            ).alias("valid_pct")
        )
        return df.agg(*aggs)

    def annotate(self, df: DataFrame) -> DataFrame:
        """Add ``_dq_valid`` (bool) and ``_dq_errors`` (csv of failed
        rule names) — the reference's row-level annotation
        (``etl_framework.py:131-137``), as a pure projection: no action,
        no extra scan, streams unchanged."""
        if not self._rules:
            raise ValueError("no rules registered")
        errs = F.concat_ws(
            ",",
            F.filter(
                F.array(
                    *[
                        F.when(pred, F.lit(name))
                        for name, pred in self._rules.items()
                    ]
                ),
                lambda x: x.isNotNull(),
            ),
        )
        return df.withColumn("_dq_errors", errs).withColumn(
            "_dq_valid", F.col("_dq_errors") == ""
        )
