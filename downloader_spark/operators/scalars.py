"""Scalar function library (SURVEY.md §2.B): string, date, math,
array, JSON, hash — all JVM built-ins (pyspark.sql.functions), all
inside whole-stage codegen, no Python in the hot path.

Each query is a pure map-stage projection: zero shuffles, and the
column pruning means the scan reads only the referenced columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.plans.registry import query


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_u,
           lower(p_brand) AS brand_l,
           substring(p_name, 1, 5) AS name_pre,
           CAST(length(p_name) AS INT) AS name_len,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_tokens,
           lpad(p_brand, 12, '*') AS brand_pad,
           concat_ws('|', p_brand, p_type) AS brand_type,
           trim(concat(' ', p_type, ' ')) AS type_trim,
           replace(p_name, ' ', '_') AS name_snake
    FROM part
    """,
    tags=("scalar",),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String library: case, substring, length, regex replace, split,
    pad, concat, trim, replace (ref analog: the reference's only
    string ops are path slicing/concat, common.go:95-101 — this is
    the full library the engine exposes)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_u"),
        F.lower("p_brand").alias("brand_l"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.size(F.split("p_name", " ")).alias("n_tokens"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_type"), F.lit(" "))).alias("type_trim"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS INT) AS yr,
           CAST(extract(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(extract(month FROM o_orderdate) AS INT) AS mon,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           strftime(o_orderdate, '%Y-%m') AS ym,
           epoch_us(o_orderdate) // 1000000 AS epoch_s,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
    FROM orders
    """,
    tags=("scalar",),
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time library: extract, trunc, diff, interval arithmetic,
    formatting, epoch conversion (ref analog: the date-partition path
    prefixes of downloader.go:64 and maxmind.go:40).

    DOW convention gap: Spark dayofweek is 1=Sunday, DuckDB 0=Sunday;
    the oracle adds 1.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mon"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        # Integer floor-division on both sides (not double divide + cast):
        # double→bigint casts truncate in Spark but round in DuckDB, and
        # only midnight-aligned inputs hide the difference.
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 1000000").alias(
            "epoch_s"
        ),
        F.dayofweek("o_orderdate").alias("dow"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS d_abs,
           sqrt(l_quantity) AS q_sqrt,
           CAST(ceil(l_extendedprice / 100) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_floor,
           l_orderkey % 7 AS key_mod,
           power(2.0, l_linenumber) AS pow2,
           round(ln(l_quantity + 1), 6) AS log_q
    FROM lineitem
    """,
    tags=("scalar",),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math library: abs/sqrt/ceil/floor/mod/pow/ln.

    sqrt and single IEEE ops are bit-exact across engines; ln is
    libm-dependent in the last ulp, so it's rounded to 6dp (a tie
    within one ulp of a 6dp boundary is the only residual risk).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("d_abs"),
        F.sqrt("l_quantity").alias("q_sqrt"),
        F.ceil(F.col("l_extendedprice") / 100).cast("bigint").alias("price_ceil"),
        F.floor(F.col("l_extendedprice") / 100).cast("bigint").alias("price_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.pow(F.lit(2.0), F.col("l_linenumber")).alias("pow2"),
        F.round(F.log(F.col("l_quantity") + 1), 6).alias("log_q"),
    )


@query(
    "scalar_array",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INT) AS dims,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_val,
           round(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS min_val,
           array_to_string(
             list_transform(embedding[1:4],
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
             ',') AS head4
    FROM embeddings
    """,
    tags=("scalar", "array"),
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array library over the embedding column: size, element access,
    min/max, slice, transform (higher-order function).

    These are structural/order ops on float32 values — no float
    arithmetic — so results are engine-exact after a widening cast.
    The slice is emitted as a comma-joined string of 1e6-scaled
    integers, not an array column: the driver's pandas canonicalizer
    cannot sort/hash list cells (CORRECTNESS_r01 TypeError), and
    integer→string formatting is engine-identical where float→string
    is not.  round() is half-away-from-zero in both engines (Java
    HALF_UP == DuckDB's rule).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dims"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 4),
                lambda x: F.round(x.cast("double") * 1000000).cast("bigint"),
            ),
            ",",
        ).alias("head4"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CASE WHEN props IS NULL THEN NULL
                ELSE CAST(json_valid(props) AS BOOLEAN) END AS is_json,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
           CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k_doubled,
           CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
                ELSE json_keys(props)[1] END AS first_key
    FROM events
    """,
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON + map operations over the events.props payload column —
    the typed-projection-from-opaque-payload pattern (ref analog:
    regex field extraction from log lines, routeviews.go:77).

    Three extraction styles, all JVM-side: path extraction
    (get_json_object), schema-on-read (from_json to a typed struct),
    and map-typed parsing (from_json to map<string,int> + map ops).
    The oracle replicates the VALUES via DuckDB's json functions —
    struct/map columns themselves never appear in the output (driver
    hasher constraint), only fields projected from them."""
    events = load_table(spark, sf_dir, "events")
    # Parse ONCE into a map and derive every column from it: each
    # additional get_json_object/from_json is a full JSON parse per
    # row, and the naive five-parse projection measured 2.2x the
    # single-parse plan at sf0.1.  Identical from_json subexpressions
    # are CSE'd by codegen, so `m` is evaluated once per row.
    m = F.from_json("props", "map<string,int>")
    return events.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        # NULL input propagates NULL on both sides; malformed input
        # parses to a NULL map == json_valid false.
        F.when(F.col("props").isNull(), F.lit(None).cast("boolean"))
        .otherwise(m.isNotNull())
        .alias("is_json"),
        F.element_at(m, "k").alias("k_typed"),
        (F.element_at(m, "k") * 2).alias("k_doubled"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


@query(
    "scalar_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256
    FROM documents
    """,
    tags=("scalar", "hash"),
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashing — the dedup identity of the reference
    (common.go:183-190 compares MD5 digests).  md5/sha2 are
    standardized so they hash-match any engine; Spark also exposes
    xxhash64/crc32 (engine-specific, used internally by the LSH
    operators, not oracle-checked here).
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
    )


@query(
    "scalar_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(CASE WHEN len(list_filter(embedding, x -> abs(x) > 0.25)) > 0
                THEN 1 ELSE 0 END AS BIGINT) AS has_large,
           CAST(CASE WHEN len(list_filter(embedding, x -> abs(x) > 2.0)) = 0
                THEN 1 ELSE 0 END AS BIGINT) AS all_small,
           CAST(floor(list_sum(list_transform(embedding,
                x -> CAST(abs(CAST(x AS DOUBLE)) AS DOUBLE))) * 10000)
                AS BIGINT) AS l1_upm
    FROM embeddings
    """,
    tags=("scalar", "array", "higher-order"),
)
def scalar_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — filter / exists / forall /
    transform+aggregate over the embedding vectors, entirely inside
    whole-stage codegen (Catalyst's lambda functions, no Python).
    exists/forall are emitted as filter-length comparisons so the
    oracle's list_filter form is the literally-same algorithm; the
    L1 norm folds left-to-right over the list in BOTH engines
    (sequential order is defined by the list, unlike a SQL SUM), so
    flooring its micro-units is deterministic.

    Pure projection: no shuffle, no Python workers — the map-stage
    vector-feature shape that feeds quality gates at corpus scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.expr("CAST(size(filter(embedding, x -> x > CAST(0 AS FLOAT))) AS BIGINT)").alias(
            "n_pos"
        ),
        F.expr(
            "CAST(CASE WHEN exists(embedding, x -> abs(x) > CAST(0.25 AS FLOAT))"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("has_large"),
        F.expr(
            "CAST(CASE WHEN forall(embedding, x -> abs(x) <= CAST(2.0 AS FLOAT))"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("all_small"),
        F.expr(
            "CAST(floor(aggregate(embedding, CAST(0 AS DOUBLE),"
            " (a, x) -> a + abs(CAST(x AS DOUBLE))) * 10000) AS BIGINT)"
        ).alias("l1_upm"),
    )


@query(
    "scalar_bits",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low8,
           CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(o_orderkey >> 4, o_orderkey) AS BIGINT) AS folded,
           CAST((o_orderkey & 1023) << 2 AS BIGINT) AS shifted,
           CAST(bit_count(o_orderkey) AS INT) AS popcnt,
           CAST(bit_count(o_orderkey) & 1 AS INT) AS parity
    FROM orders
    """,
    tags=("scalar", "bitwise"),
)
def scalar_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: AND/OR/XOR masks, shifts, popcount and
    parity over the order key — the bit-twiddling family behind flag
    fields, hash mixing, and bitmap encodings (agg_bitmap_distinct's
    row-level vocabulary).

    Pure projection, no shuffle, fully codegen'd JVM-side.  The one
    dialect fork: '^' means XOR in Spark SQL but POWER in DuckDB, so
    the oracle spells xor() while Spark uses the operator — same
    bits, different spelling (documented here because it is the
    canonical cross-dialect bit-op trap)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").cast("long").alias("low8"),
        F.expr("o_orderkey | 4096").cast("long").alias("with_flag"),
        F.expr("shiftright(o_orderkey, 4) ^ o_orderkey").cast("long").alias("folded"),
        F.expr("shiftleft(o_orderkey & 1023, 2)").cast("long").alias("shifted"),
        F.expr("bit_count(o_orderkey)").cast("int").alias("popcnt"),
        F.expr("bit_count(o_orderkey) & 1").cast("int").alias("parity"),
    )


@query(
    "scalar_map",
    oracle="""
    WITH m AS (
      SELECT p_partkey,
             map(['brand', 'type', 'size'],
                 [p_brand, p_type, CAST(p_size AS VARCHAR)]) AS pm
      FROM part
    )
    SELECT p_partkey,
           pm['brand'][1] AS brand_val,
           pm['container'][1] AS missing_val,
           CAST(cardinality(pm) AS INT) AS n_keys,
           array_to_string(list_sort(map_keys(pm)), ',') AS keys_sorted,
           array_to_string(map_values(pm), '|') AS vals_joined,
           CAST(len(pm['type']) > 0 AS BOOLEAN) AS has_type
    FROM m
    """,
    tags=("scalar", "map", "types"),
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type scalar surface: construct a map from key/value
    arrays, extract present and MISSING keys, count entries, sort
    keys, join values, and test membership — the semi-structured
    attribute-bag vocabulary (feature maps, tag sets, JSON-ish
    payloads with typed access).

    Pure projection, no shuffle.  Dialect notes the key exercises:
    Spark 4 runs ANSI mode, where element_at on a missing key ERRORS
    — the null-safe form is try_element_at (used here); DuckDB's
    bracket-extract returns a LIST ([] when missing), so the oracle
    spells value access as m[k][1].  Same nulls, same scalars, two
    map dialects."""
    part = load_table(spark, sf_dir, "part")
    m = part.select(
        "p_partkey",
        F.map_from_arrays(
            F.array(F.lit("brand"), F.lit("type"), F.lit("size")),
            F.array(
                F.col("p_brand"),
                F.col("p_type"),
                F.col("p_size").cast("string"),
            ),
        ).alias("pm"),
    )
    return m.select(
        "p_partkey",
        F.expr("try_element_at(pm, 'brand')").alias("brand_val"),
        F.expr("try_element_at(pm, 'container')").alias("missing_val"),
        F.size("pm").cast("int").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys("pm")), ",").alias("keys_sorted"),
        F.array_join(F.map_values("pm"), "|").alias("vals_joined"),
        F.expr("map_contains_key(pm, 'type')").alias("has_type"),
    )
