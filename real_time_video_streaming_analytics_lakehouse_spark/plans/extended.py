"""Extended coverage: cleaning transforms, array aggregation, exact
percentiles, corpus-trained language ID, multimodal decode plumbing,
SimHash near-dup (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import simhash_candidates
from ..operators.multimodal import attach_fake_media, decode_media_features
from ..operators.transforms import clean_and_standardize
from ..sources.readers import load_table
from .catalog import QuerySpec


# --- clean_standardize_customers (F2-F5: trim / empty→NULL / upper / IP) --

def clean_standardize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty columns are derived deterministically from ``customer`` in
    BOTH engines (padding, lowercasing, injected bad IPs), then cleaned
    with the reference's pipeline (etl_framework.py:337-365)."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    dirty = cust.select(
        "c_custkey",
        F.concat(F.lit("  "), F.col("c_name"), F.lit("\t")).alias("name_raw"),
        F.when(k % 5 == 0, "").otherwise(F.col("c_mktsegment")).alias("segment_raw"),
        F.lower(F.col("c_mktsegment")).alias("country_raw"),
        F.when(k % 3 == 0, F.concat(F.lit("192.168.1."), (k % 256).cast("string")))
        .when(k % 3 == 1, F.lit("999.999.1.1"))
        .alias("ip_raw"),
    )
    return clean_and_standardize(
        dirty,
        text_cols=["name_raw", "segment_raw"],
        country_col="country_raw",
        ip_col="ip_raw",
    ).select(
        "c_custkey",
        F.col("name_raw").alias("name_clean"),
        F.col("segment_raw").alias("segment_clean"),
        F.col("country_raw").alias("country_clean"),
        F.col("ip_raw").alias("ip_clean"),
    )


CLEAN_STANDARDIZE_CUSTOMERS_SQL = r"""
WITH dirty AS (
  SELECT c_custkey,
         '  ' || c_name || chr(9) AS name_raw,
         CASE WHEN c_custkey % 5 = 0 THEN '' ELSE c_mktsegment END AS segment_raw,
         lower(c_mktsegment) AS country_raw,
         CASE WHEN c_custkey % 3 = 0
              THEN '192.168.1.' || CAST(c_custkey % 256 AS VARCHAR)
              WHEN c_custkey % 3 = 1 THEN '999.999.1.1'
         END AS ip_raw
  FROM customer)
SELECT c_custkey,
       NULLIF(regexp_replace(name_raw, '^\s+|\s+$', '', 'g'), '') AS name_clean,
       NULLIF(regexp_replace(segment_raw, '^\s+|\s+$', '', 'g'), '') AS segment_clean,
       upper(country_raw) AS country_clean,
       CASE WHEN regexp_matches(ip_raw,
              '^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$')
            THEN ip_raw END AS ip_clean
FROM dirty
"""


# user_event_type_sets (collect_set / array agg, F16) was folded into
# events_views.daily_user_metrics (its event_types column) so the whole
# catalog fits the driver's 50-query check window.


# --- value_percentiles (exact interpolated percentiles) -------------------

def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY 1
"""


# --- lang_id_confusion (corpus-trained unigram language ID) ---------------

def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage heuristic language ID: learn the top-20 most frequent
    tokens per language from the corpus (ties broken lexically), then
    classify each doc by profile-overlap argmax (ties → lexically first
    language). Output is the confusion matrix against the labeled
    ``lang`` column."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    counts = words.groupBy("lang", "w").agg(F.count("*").alias("cnt"))
    wr = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("w"))
    profile = (
        counts.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 20)
        .select(F.col("lang").alias("cand_lang"), "w")
    )
    doc_words = words.select("doc_id", "w").distinct()
    overlap = (
        doc_words.join(profile, "w")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("overlap"))
    )
    wp = Window.partitionBy("doc_id").orderBy(
        F.col("overlap").desc(), F.col("cand_lang")
    )
    pred = (
        overlap.withColumn("prk", F.row_number().over(wp))
        .filter(F.col("prk") == 1)
        .select("doc_id", F.col("cand_lang").alias("predicted_lang"))
    )
    return (
        docs.join(pred, "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("docs"))
    )


LANG_ID_CONFUSION_SQL = r"""
WITH words AS (
  SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents),
counts AS (SELECT lang, w, COUNT(*) AS cnt FROM words GROUP BY 1, 2),
profile AS (
  SELECT lang AS cand_lang, w FROM (
    SELECT lang, w, ROW_NUMBER() OVER (
        PARTITION BY lang ORDER BY cnt DESC, w) AS rk
    FROM counts) WHERE rk <= 20),
doc_words AS (SELECT DISTINCT doc_id, w FROM words),
overlap AS (
  SELECT d.doc_id, p.cand_lang, COUNT(*) AS overlap
  FROM doc_words d JOIN profile p ON d.w = p.w
  GROUP BY 1, 2),
pred AS (
  SELECT doc_id, cand_lang AS predicted_lang FROM (
    SELECT doc_id, cand_lang, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY overlap DESC, cand_lang) AS prk
    FROM overlap) WHERE prk = 1)
SELECT d.lang, p.predicted_lang, COUNT(*) AS docs
FROM documents d JOIN pred p ON d.doc_id = p.doc_id
GROUP BY 1, 2
"""


# --- multimodal_decode_stats (binary columns + mapInPandas decode) --------

def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized binary media column → Arrow-batched mapInPandas
    decode (deterministic fake; real decoder is the documented
    NotImplementedError plug-in point) → per-format stats. The oracle
    reproduces the fake decode with hex arithmetic over md5(text)."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media_features(attach_fake_media(docs))
    return decoded.groupBy("media_format").agg(
        F.count("*").alias("files"),
        (F.sum("width") / F.count("*")).alias("avg_width"),
        (F.sum("height") / F.count("*")).alias("avg_height"),
        F.max("n_frames").alias("max_frames"),
        F.sum("payload_bytes").alias("total_bytes"),
    )


MULTIMODAL_DECODE_STATS_SQL = """
WITH decoded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'png'
              WHEN doc_id % 3 = 1 THEN 'jpeg'
              ELSE 'mp4' END AS media_format,
         16 AS payload_bytes,
         ('0x' || substr(md5(text), 1, 2))::INTEGER % 128 + 1 AS width,
         ('0x' || substr(md5(text), 3, 2))::INTEGER % 128 + 1 AS height,
         ('0x' || substr(md5(text), 5, 2))::INTEGER % 120 + 1 AS n_frames
  FROM documents)
SELECT media_format,
       COUNT(*) AS files,
       SUM(width) / COUNT(*) AS avg_width,
       SUM(height) / COUNT(*) AS avg_height,
       CAST(MAX(n_frames) AS INTEGER) AS max_frames,
       CAST(SUM(payload_bytes) AS BIGINT) AS total_bytes
FROM decoded GROUP BY 1
"""


# --- multimodal frame sampling + resize (1→N explode, integer-exact
# fit-to-box; fingerprints reproduce in DuckDB as md5 over
# hex(payload)=md5(text) string arithmetic) -------------------------------

def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-stride frame sampling over the synthesized media column:
    ≤4 frames per doc, one row per sampled frame with a deterministic
    frame fingerprint."""
    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_fake_media(docs), max_frames=4)


MULTIMODAL_FRAME_SAMPLES_SQL = """
WITH media AS (
  SELECT doc_id, md5(text) AS hexp,
         ('0x' || substr(md5(text), 5, 2))::INTEGER % 120 + 1 AS n_frames
  FROM documents),
frames AS (
  SELECT doc_id, hexp,
         unnest(generate_series(0, n_frames - 1,
                CAST(ceil(n_frames / 4.0) AS INTEGER))) AS frame_idx
  FROM media)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       md5(hexp || ':' || CAST(frame_idx AS VARCHAR)) AS frame_fp
FROM frames
"""


def multimodal_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving fit-to-box resize of the synthesized images:
    integer-exact new dimensions + resized-payload fingerprint."""
    from ..operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    return resize_images(attach_fake_media(docs), max_w=64, max_h=64)


MULTIMODAL_RESIZE_DIMS_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'png'
              WHEN doc_id % 3 = 1 THEN 'jpeg'
              ELSE 'mp4' END AS media_format,
         md5(text) AS hexp,
         ('0x' || substr(md5(text), 1, 2))::INTEGER % 128 + 1 AS w,
         ('0x' || substr(md5(text), 3, 2))::INTEGER % 128 + 1 AS h
  FROM documents),
r AS (
  SELECT doc_id, media_format, w, h,
         CASE WHEN w <= 64 AND h <= 64 THEN w
              WHEN w * 64 <= h * 64 THEN greatest(1, (w * 64) // h)
              ELSE 64 END AS new_width,
         CASE WHEN w <= 64 AND h <= 64 THEN h
              WHEN w * 64 <= h * 64 THEN 64
              ELSE greatest(1, (h * 64) // w) END AS new_height,
         hexp
  FROM m)
SELECT doc_id, media_format,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(new_width AS INTEGER) AS new_width,
       CAST(new_height AS INTEGER) AS new_height,
       md5(hexp || ':' || CAST(new_width AS VARCHAR) || 'x'
           || CAST(new_height AS VARCHAR)) AS resized_fp
FROM r
"""


# --- user_value_timeline (W6: lead / dense_rank / first_value) ------------

def user_value_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the window functions the reference imports but never
    uses (etl_framework.py:29-30 — lead, dense_rank, first_value):
    per-user event timeline with next-event gap, per-user value dense
    rank, and first value."""
    from ..functions.dialect import epoch_us

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wv = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    us = epoch_us(F.col("ts"))
    return e.select(
        "user_id",
        "event_id",
        us.alias("ts_us"),
        ((F.lead(us).over(w) - us)).alias("gap_to_next_us"),
        F.dense_rank().over(wv).alias("value_dense_rank"),
        F.first("value").over(w).alias("first_value_seen"),
    )


USER_VALUE_TIMELINE_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_to_next_us,
       DENSE_RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
           AS value_dense_rank,
       FIRST_VALUE(value) OVER w AS first_value_seen
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
"""


# --- incremental_extract (P5 range predicate + A6 global max watermark) ---

def incremental_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's incremental-extract pattern (etl_framework.py:
    216-249): read the target's max watermark (global agg → driver
    boundary), then filter the source above it. The watermark here is
    max(ts) of the 'already loaded' first 20 days."""
    from ..functions.dialect import epoch_us

    e = load_table(spark, sf_dir, "events")
    loaded = e.filter(
        F.col("ts") < F.lit("2024-01-21 00:00:00").cast("timestamp_ntz")
    )
    last_ts = loaded.agg(F.max("ts")).collect()[0][0]
    fresh = e.filter(F.col("ts") > F.lit(last_ts))
    return fresh.groupBy("event_type").agg(
        F.count("*").alias("fresh_events"),
        F.min(epoch_us(F.col("ts"))).alias("min_ts_us"),
        F.round(F.sum("value"), 2).alias("fresh_value"),
    )


INCREMENTAL_EXTRACT_SQL = """
SELECT event_type, COUNT(*) AS fresh_events,
       MIN(epoch_us(ts)) AS min_ts_us,
       ROUND(SUM(value), 2) AS fresh_value
FROM events
WHERE ts > (SELECT MAX(ts) FROM events
            WHERE ts < TIMESTAMP '2024-01-21 00:00:00')
GROUP BY 1
"""


# --- star_schema_monthly (fact ↔ generated DIM_TIME join, J2/S13) ---------

def star_schema_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse path (SURVEY §3.3): events as the fact, joined to
    the generated calendar dimension on the surrogate ``time_key``
    (snowflake_pipeline.py:305-345), rolled up by month attributes.
    The dim side is generated, bounded (366 rows), and broadcast."""
    from ..functions.dialect import day_name, month_name, time_key

    e = load_table(spark, sf_dir, "events")
    days = spark.range(0, 366).select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias(
            "date_value"
        )
    )
    d = F.col("date_value")
    dim_time = days.select(
        time_key(d).alias("time_key"),
        F.month(d).alias("month_num"),
        month_name(d).alias("month_name"),
        (F.weekday(d) >= 5).alias("is_weekend"),
    )
    fact = e.select(
        time_key(F.to_date("ts")).alias("time_key"), "event_type", "value"
    )
    return (
        fact.join(F.broadcast(dim_time), "time_key")
        .groupBy("month_name", "is_weekend")
        .agg(
            F.count("*").alias("events_cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


STAR_SCHEMA_MONTHLY_SQL = """
WITH dim_time AS (
  SELECT CAST(year(d) * 10000 + month(d) * 100 + day(d) AS INTEGER) AS time_key,
         monthname(d) AS month_name,
         isodow(d) >= 6 AS is_weekend
  FROM generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY) t(d)),
fact AS (
  SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS INTEGER) AS time_key,
         event_type, value
  FROM events)
SELECT d.month_name, d.is_weekend,
       COUNT(*) AS events_cnt,
       ROUND(SUM(f.value), 2) AS total_value
FROM fact f JOIN dim_time d ON f.time_key = d.time_key
GROUP BY 1, 2
"""


# --- orders_above_segment_avg (correlated subquery → window rewrite) ------

def orders_above_segment_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape ('orders above their segment's average
    price') rewritten as a window aggregate — one shuffle instead of a
    per-row subquery. The window average is round(sum)/count so both
    engines compare against the identical threshold double."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(
        cust.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment")
    seg_avg = F.round(F.sum("o_totalprice").over(w), 2) / F.count("*").over(w)
    return (
        joined.withColumn("segment_avg", seg_avg)
        .filter(F.col("o_totalprice") > F.col("segment_avg"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("above_avg_orders"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


ORDERS_ABOVE_SEGMENT_AVG_SQL = """
WITH joined AS (
  SELECT o.o_totalprice, c.c_mktsegment,
         ROUND(SUM(o.o_totalprice) OVER (PARTITION BY c.c_mktsegment), 2)
           / COUNT(*) OVER (PARTITION BY c.c_mktsegment) AS segment_avg
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
SELECT c_mktsegment,
       COUNT(*) AS above_avg_orders,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM joined WHERE o_totalprice > segment_avg
GROUP BY 1
"""


# --- party_union (set ops — beyond the reference, SURVEY §2.6 note) -------

def party_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.lit("customer").alias("party_type"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("party_type"),
        F.col("s_acctbal").alias("acctbal"),
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.unionByName(supp)
        .join(nation, F.col("nationkey") == nation.n_nationkey)
        .groupBy("n_name", "party_type")
        .agg(
            F.count("*").alias("parties"),
            F.round(F.sum("acctbal"), 2).alias("total_acctbal"),
        )
    )


PARTY_UNION_SQL = """
WITH parties AS (
  SELECT c_nationkey AS nationkey, 'customer' AS party_type, c_acctbal AS acctbal
  FROM customer
  UNION ALL
  SELECT s_nationkey, 'supplier', s_acctbal FROM supplier)
SELECT n.n_name, p.party_type, COUNT(*) AS parties,
       ROUND(SUM(p.acctbal), 2) AS total_acctbal
FROM parties p JOIN nation n ON p.nationkey = n.n_nationkey
GROUP BY 1, 2
"""


# --- regex_token_counts (BPE-ish regex tokenization) ----------------------

def regex_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a word/punctuation regex (the 'BPE-ish'
    tokenizer of the north-star list) alongside whitespace counting."""
    d = load_table(spark, sf_dir, "documents")
    ws_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    re_tokens = F.size(F.regexp_extract_all("text", F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)))
    return d.groupBy("source").agg(
        F.count("*").alias("docs"),
        F.sum(ws_tokens).alias("ws_tokens"),
        F.sum(re_tokens).alias("re_tokens"),
        (F.sum(re_tokens) / F.sum(ws_tokens)).alias("ratio"),
    )


REGEX_TOKEN_COUNTS_SQL = r"""
SELECT source, COUNT(*) AS docs,
       CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS re_tokens,
       SUM(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')))
         / SUM(len(string_split_regex(trim(text), '\s+'))) AS ratio
FROM documents GROUP BY 1
"""


# --- simhash_pairs (rows-only; hash-function-specific) --------------------

def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_candidates(docs, max_hamming=3)


QUERIES: dict[str, QuerySpec] = {
    "clean_standardize_customers": QuerySpec(
        clean_standardize_customers,
        CLEAN_STANDARDIZE_CUSTOMERS_SQL,
        "trim / empty→NULL / upper / IPv4 validation (F2-F5)",
    ),
    "value_percentiles": QuerySpec(
        value_percentiles, VALUE_PERCENTILES_SQL, "exact interpolated percentiles"
    ),
    "lang_id_confusion": QuerySpec(
        lang_id_confusion, LANG_ID_CONFUSION_SQL, "corpus-trained unigram language ID"
    ),
    "multimodal_decode_stats": QuerySpec(
        multimodal_decode_stats,
        MULTIMODAL_DECODE_STATS_SQL,
        "binary media column + mapInPandas decode stub",
    ),
    "multimodal_frame_samples": QuerySpec(
        multimodal_frame_samples,
        MULTIMODAL_FRAME_SAMPLES_SQL,
        "uniform-stride frame sampling (1→N mapInPandas explode)",
    ),
    "multimodal_resize_dims": QuerySpec(
        multimodal_resize_dims,
        MULTIMODAL_RESIZE_DIMS_SQL,
        "aspect-preserving fit-to-box resize, integer-exact dims",
    ),
    "simhash_pairs": QuerySpec(
        simhash_pairs, None, "SimHash near-dup candidates (rows-only)"
    ),
    "user_value_timeline": QuerySpec(
        user_value_timeline, USER_VALUE_TIMELINE_SQL, "lead/dense_rank/first_value (W6)"
    ),
    "incremental_extract": QuerySpec(
        incremental_extract, INCREMENTAL_EXTRACT_SQL, "watermark-driven incremental read (P5+A6)"
    ),
    "star_schema_monthly": QuerySpec(
        star_schema_monthly, STAR_SCHEMA_MONTHLY_SQL, "fact ↔ generated DIM_TIME join (J2+S13)"
    ),
    "orders_above_segment_avg": QuerySpec(
        orders_above_segment_avg,
        ORDERS_ABOVE_SEGMENT_AVG_SQL,
        "correlated subquery → window rewrite",
    ),
    "party_union": QuerySpec(
        party_union, PARTY_UNION_SQL, "unionByName set op + dim join"
    ),
    "regex_token_counts": QuerySpec(
        regex_token_counts, REGEX_TOKEN_COUNTS_SQL, "regex (BPE-ish) tokenization"
    ),
}
