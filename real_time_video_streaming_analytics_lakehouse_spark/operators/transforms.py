"""Cleaning / standardization transforms.

Mirrors the reference's ``TransformationEngine.clean_and_standardize``
(``spark-jobs/etl_framework.py:337-365``): whitespace trimming,
empty-string → NULL, country-code upper-casing, and IPv4 validation via
``regexp_extract`` (invalid → NULL). All pure Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IPV4_RE = (
    r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
    r"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
)


def trimmed(col: Column) -> Column:
    """Strip leading/trailing whitespace (reference uses
    ``regexp_replace('^\\s+|\\s+$', '')``; ``trim`` only strips spaces,
    so keep the regexp form for tab/newline parity)."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def empty_to_null(col: Column) -> Column:
    """'' → NULL (reference etl_framework.py:347-348)."""
    return F.when(col == "", None).otherwise(col)


def valid_ipv4_or_null(col: Column) -> Column:
    """Keep syntactically valid IPv4 strings, else NULL
    (reference etl_framework.py:354-359)."""
    return F.when(F.regexp_extract(col, IPV4_RE, 0) != "", col)


def clean_and_standardize(
    df: DataFrame,
    text_cols: list[str] | None = None,
    country_col: str | None = None,
    ip_col: str | None = None,
) -> DataFrame:
    """Apply the reference's cleaning pipeline to the named columns."""
    out = df
    for c in text_cols or []:
        out = out.withColumn(c, empty_to_null(trimmed(F.col(c))))
    if country_col:
        out = out.withColumn(country_col, F.upper(F.col(country_col)))
    if ip_col:
        out = out.withColumn(ip_col, valid_ipv4_or_null(F.col(ip_col)))
    return out
