"""Network-analytics operators: the consumption side of the data the
reference exists to fetch.

The reference's whole purpose is keeping RouteViews ``pfx2as`` files
(IP-prefix → AS-number tables) and Maxmind snapshots fresh in object
storage (/root/reference/download/routeviews.go:15-21,
/root/reference/README.md) so downstream pipelines can annotate
measurement IPs with their origin AS — a LONGEST-PREFIX-MATCH join.
These operators re-express that downstream join Spark-first, with the
prefix/IP inputs derived deterministically from the TPC-H-shaped
testdata (md5-based, so the DuckDB oracle rebuilds byte-identical
inputs — the same verifiable-surface pattern as text_pii_mask).

Scale design — LPM WITHOUT a range join: with a fixed ladder of
prefix lengths (/8, /16, /24 here; any fixed set works), each IP has
exactly one candidate network per length, so LPM collapses to ONE
equi-join: explode each IP into its (start, len) candidates and join
the (deduplicated) prefix table on that pair, then keep the
longest-match row per IP with a struct-max aggregate.  The join key
is uniform (md5-derived starts), the prefix table is the small side
(real pfx2as is ~1M rows ≈ tens of MB → broadcast; here it is
explicitly broadcast and plan-gated), and nothing is ever compared by
range — the classic O(rows × ladder-size) trick that survives 100 TB
where an interval join would quadratically blow up on popular /8s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import _duck_h60, _spark_h60
from downloader_spark.plans.registry import query

# Octet-space moduli: small enough that the derived prefix tables are
# DENSE over their slots (nations cover all 8 /8s; ~100 suppliers over
# 128 /16 slots; ~1.5k customers over 4096 /24 slots at sf0.01), so a
# lookup IP matches a /8 always and deeper levels often — every LPM
# branch (8/16/24/deepest-wins) is exercised by real rows.
_A_MOD = 8
_B_MOD = 16
_C_MOD = 32


def _spark_oct(tag: str, key_sql: str, mod: int) -> str:
    arg = f"concat('{tag}:', CAST({key_sql} AS STRING))"
    return f"pmod({_spark_h60(arg)}, {mod})"


def _duck_oct(tag: str, key_sql: str, mod: int) -> str:
    arg = f"concat('{tag}:', CAST({key_sql} AS VARCHAR))"
    return f"({_duck_h60(arg)} % {mod})"


def _ip_expr(oct_fn, key_sql: str) -> str:
    """32-bit IP as pure arithmetic (identical in both engines):
    a.b.c.d with a < 8, b < 16, c < 32 d < 256 per the moduli above."""
    a = oct_fn("a", key_sql, _A_MOD)
    b = oct_fn("b", key_sql, _B_MOD)
    c = oct_fn("c", key_sql, _C_MOD)
    return (
        f"({a}) * 16777216 + ({b}) * 65536 + ({c}) * 256 "
        f"+ ({key_sql}) % 256"
    )


_DUCK_PREFIXES = f"""
    p8 AS (
      SELECT (n_nationkey % {_A_MOD}) * 16777216 AS start,
             8 AS plen, min(1000 + n_nationkey) AS asn
      FROM nation GROUP BY 1, 2
    ),
    p16 AS (
      SELECT {_duck_oct("a16", "s_suppkey", _A_MOD)} * 16777216
             + {_duck_oct("b16", "s_suppkey", _B_MOD)} * 65536 AS start,
             16 AS plen, min(20000 + s_suppkey) AS asn
      FROM supplier GROUP BY 1, 2
    ),
    p24 AS (
      SELECT {_duck_oct("a24", "c_custkey", _A_MOD)} * 16777216
             + {_duck_oct("b24", "c_custkey", _B_MOD)} * 65536
             + {_duck_oct("c24", "c_custkey", _C_MOD)} * 256 AS start,
             24 AS plen, min(300000 + c_custkey) AS asn
      FROM customer GROUP BY 1, 2
    ),
    prefixes AS (
      SELECT * FROM p8 UNION ALL SELECT * FROM p16 UNION ALL SELECT * FROM p24
    )
"""


def _spark_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(start, plen, asn) at the three ladder lengths, deduplicated per
    network with the minimum ASN (two generators hitting one slot must
    resolve identically in both engines)."""
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    p8 = nation.groupBy(
        (F.expr(f"n_nationkey % {_A_MOD}") * 16777216).alias("start"),
        F.lit(8).alias("plen"),
    ).agg(F.min(F.expr("1000 + n_nationkey")).alias("asn"))
    p16 = supplier.groupBy(
        F.expr(
            f"{_spark_oct('a16', 's_suppkey', _A_MOD)} * 16777216"
            f" + {_spark_oct('b16', 's_suppkey', _B_MOD)} * 65536"
        ).alias("start"),
        F.lit(16).alias("plen"),
    ).agg(F.min(F.expr("20000 + s_suppkey")).alias("asn"))
    p24 = customer.groupBy(
        F.expr(
            f"{_spark_oct('a24', 'c_custkey', _A_MOD)} * 16777216"
            f" + {_spark_oct('b24', 'c_custkey', _B_MOD)} * 65536"
            f" + {_spark_oct('c24', 'c_custkey', _C_MOD)} * 256"
        ).alias("start"),
        F.lit(24).alias("plen"),
    ).agg(F.min(F.expr("300000 + c_custkey")).alias("asn"))
    return p8.unionByName(p16).unionByName(p24)


@query(
    "join_ip_prefix",
    oracle=f"""
    WITH {_DUCK_PREFIXES},
    ips AS (
      SELECT o_orderkey, {_ip_expr(_duck_oct, "o_orderkey")} AS ip
      FROM orders
    ),
    cands AS (
      SELECT o_orderkey, ip, ip - ip % 16777216 AS start, 8 AS plen FROM ips
      UNION ALL
      SELECT o_orderkey, ip, ip - ip % 65536, 16 FROM ips
      UNION ALL
      SELECT o_orderkey, ip, ip - ip % 256, 24 FROM ips
    ),
    hits AS (
      SELECT c.o_orderkey, c.ip, c.plen, p.asn
      FROM cands c JOIN prefixes p ON p.start = c.start AND p.plen = c.plen
    )
    SELECT o_orderkey, ip,
           CAST(max(plen) AS INT) AS matched_len,
           max_by(asn, plen) AS asn
    FROM hits
    GROUP BY o_orderkey, ip
    """,
    tags=("network", "join", "reference-domain"),
)
def join_ip_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match IP→AS annotation — the downstream join the
    reference's RouteViews pfx2as downloads feed
    (/root/reference/download/routeviews.go:15-21): each order-derived
    IP is matched against a three-level prefix table (/8 from nation,
    /16 from supplier, /24 from customer, ASN = min per network) and
    annotated with its most-specific match.

    Fixed-ladder LPM as ONE broadcast equi-join: the IP side explodes
    to exactly 3 (start, len) candidates (pure arithmetic — no range
    predicate anywhere), the deduplicated prefix table broadcasts
    (real pfx2as tables are tens of MB), and the longest match wins
    via a single struct-max aggregate (map-side combinable).  Per-IP
    work is O(ladder), independent of prefix-table size or skew —
    an interval join would instead pair every IP with every covering
    prefix range probe, melting down on popular /8s at 100 TB."""
    ips = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr(_ip_expr(_spark_oct, "o_orderkey")).alias("ip")
    )
    cands = ips.select(
        "o_orderkey",
        "ip",
        F.explode(
            F.array(
                F.struct(
                    F.expr("ip - ip % 16777216").alias("start"),
                    F.lit(8).alias("plen"),
                ),
                F.struct(
                    F.expr("ip - ip % 65536").alias("start"),
                    F.lit(16).alias("plen"),
                ),
                F.struct(
                    F.expr("ip - ip % 256").alias("start"),
                    F.lit(24).alias("plen"),
                ),
            )
        ).alias("cand"),
    ).select("o_orderkey", "ip", "cand.start", "cand.plen")
    hits = cands.join(F.broadcast(_spark_prefixes(spark, sf_dir)), ["start", "plen"])
    best = hits.groupBy("o_orderkey", "ip").agg(
        F.max(F.struct(F.col("plen"), F.col("asn"))).alias("m")
    )
    return best.select(
        "o_orderkey",
        "ip",
        F.col("m.plen").cast("int").alias("matched_len"),
        F.col("m.asn").alias("asn"),
    )


@query(
    "scalar_ip",
    oracle=f"""
    WITH ips AS (
      SELECT o_orderkey, {_ip_expr(_duck_oct, "o_orderkey")} AS ip
      FROM orders
    )
    SELECT o_orderkey, ip,
           concat(CAST(ip // 16777216 AS VARCHAR), '.',
                  CAST((ip // 65536) % 256 AS VARCHAR), '.',
                  CAST((ip // 256) % 256 AS VARCHAR), '.',
                  CAST(ip % 256 AS VARCHAR)) AS dotted,
           ip - ip % 65536 AS net16,
           CAST(ip % 65536 AS BIGINT) AS host16,
           CASE WHEN ip % 16777216 < 65536 THEN 1 ELSE 0 END AS in_low_slash16
    FROM ips
    """,
    tags=("network", "scalar", "reference-domain"),
)
def scalar_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP scalar surface over the derived 32-bit addresses: dotted-quad
    formatting, network/host split at /16, and a containment predicate
    — the address arithmetic an annotation pipeline leans on, kept as
    pure integer division/modulo so both engines agree bit-for-bit
    (no bitwise-operator dialect differences)."""
    ips = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr(_ip_expr(_spark_oct, "o_orderkey")).alias("ip")
    )
    return ips.select(
        "o_orderkey",
        "ip",
        F.expr(
            "concat(CAST(ip DIV 16777216 AS STRING), '.',"
            " CAST((ip DIV 65536) % 256 AS STRING), '.',"
            " CAST((ip DIV 256) % 256 AS STRING), '.',"
            " CAST(ip % 256 AS STRING))"
        ).alias("dotted"),
        F.expr("ip - ip % 65536").alias("net16"),
        F.expr("CAST(ip % 65536 AS BIGINT)").alias("host16"),
        F.expr(
            "CASE WHEN ip % 16777216 < 65536 THEN 1 ELSE 0 END"
        ).alias("in_low_slash16"),
    )
