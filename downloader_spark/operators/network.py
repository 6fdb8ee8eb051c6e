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

Scale design — LPM WITHOUT a range join: for any set of prefix
lengths, each IP has exactly one candidate network per length, so LPM
collapses to ONE equi-join: explode each IP into its (start, len)
candidates — the ladder taken from the DISTINCT plens actually
present in the prefix dim, since real pfx2as announcements carry
arbitrary lengths (/8../24-ish v4, /16../64 v6, planted off-octet
/20 and off-nibble /44 levels here prove the matcher is data-driven)
— and join the (deduplicated) prefix table on that pair, then keep
the longest-match row per IP with a struct-max aggregate.  The join key
is uniform (md5-derived starts), the prefix table is the small side
(real pfx2as is ~1M rows ≈ tens of MB → broadcast; here it is
explicitly broadcast and plan-gated), and nothing is ever compared by
range — the classic O(rows × ladder-size) trick that survives 100 TB
where an interval join would quadratically blow up on popular /8s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table, spread
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
    p20 AS (
      SELECT {_duck_oct("a20", "p_partkey", _A_MOD)} * 16777216
             + {_duck_oct("b20", "p_partkey", _B_MOD)} * 65536
             + {_duck_oct("c20", "p_partkey", 2)} * 4096 AS start,
             20 AS plen, min(50000 + p_partkey) AS asn
      FROM part WHERE p_partkey % 23 = 0 GROUP BY 1, 2
    ),
    p24 AS (
      SELECT {_duck_oct("a24", "c_custkey", _A_MOD)} * 16777216
             + {_duck_oct("b24", "c_custkey", _B_MOD)} * 65536
             + {_duck_oct("c24", "c_custkey", _C_MOD)} * 256 AS start,
             24 AS plen, min(300000 + c_custkey) AS asn
      FROM customer GROUP BY 1, 2
    ),
    prefixes AS (
      SELECT * FROM p8 UNION ALL SELECT * FROM p16
      UNION ALL SELECT * FROM p20 UNION ALL SELECT * FROM p24
    )
"""


def _spark_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(start, plen, asn) at the ladder lengths /8 /16 /20 /24,
    deduplicated per network with the minimum ASN (two generators
    hitting one slot must resolve identically in both engines).  The
    /20 level is deliberately OFF the classful-octet ladder — real
    pfx2as announcements carry arbitrary lengths, and a matcher with
    a hard-coded octet ladder silently misses it.  The off-ladder
    generators are SPARSIFIED (every-23rd part / every-17th customer)
    so each ladder depth, shallow and deep, still occurs as some
    IP's final longest match."""
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
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
    p20 = part.filter(F.expr("p_partkey % 23 = 0")).groupBy(
        F.expr(
            f"{_spark_oct('a20', 'p_partkey', _A_MOD)} * 16777216"
            f" + {_spark_oct('b20', 'p_partkey', _B_MOD)} * 65536"
            f" + {_spark_oct('c20', 'p_partkey', 2)} * 4096"
        ).alias("start"),
        F.lit(20).alias("plen"),
    ).agg(F.min(F.expr("50000 + p_partkey")).alias("asn"))
    p24 = customer.groupBy(
        F.expr(
            f"{_spark_oct('a24', 'c_custkey', _A_MOD)} * 16777216"
            f" + {_spark_oct('b24', 'c_custkey', _B_MOD)} * 65536"
            f" + {_spark_oct('c24', 'c_custkey', _C_MOD)} * 256"
        ).alias("start"),
        F.lit(24).alias("plen"),
    ).agg(F.min(F.expr("300000 + c_custkey")).alias("asn"))
    return (
        p8.unionByName(p16).unionByName(p20).unionByName(p24)
        .localCheckpoint()
    )


@query(
    "join_ip_prefix",
    oracle=f"""
    WITH {_DUCK_PREFIXES},
    ips AS (
      SELECT o_orderkey, {_ip_expr(_duck_oct, "o_orderkey")} AS ip
      FROM orders
    ),
    cands AS (
      SELECT o_orderkey, ip,
             ip - ip % (CAST(1 AS BIGINT) << (32 - plen)) AS start, plen
      FROM ips CROSS JOIN (SELECT DISTINCT plen FROM prefixes) lp
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

    DATA-DRIVEN-ladder LPM as ONE broadcast equi-join: the candidate
    ladder is the DISTINCT prefix lengths actually present in the
    (broadcast) prefix dim — real pfx2as files announce arbitrary
    lengths (the planted /20 here would be silently missed by a
    hard-coded /8-/16-/24 octet ladder).  The distinct-plen set
    rides along as a one-row collect_set anchor (the same tiny-frame
    crossJoin pattern the scalar-anchor operators use), each IP
    explodes to exactly |distinct plens| (start, len) candidates by
    pure mask arithmetic (no range predicate anywhere), the
    deduplicated prefix table broadcasts (real pfx2as tables are
    tens of MB), and the longest match wins via a single struct-max
    aggregate (map-side combinable).  Per-IP work is O(|plens|) ≤ 33,
    independent of prefix-table size or skew — an interval join would
    instead pair every IP with every covering prefix range probe,
    melting down on popular /8s at 100 TB."""
    # spread: the md5-octet IP derivation + explode + broadcast probe
    # is map-side CPU that otherwise runs in the single-split scan
    # task (profiled r16); hash-partitioning on o_orderkey lets the
    # longest-match groupBy below reuse the exchange (o_orderkey is a
    # subset of its grouping key)
    ips = spread(
        load_table(spark, sf_dir, "orders").select("o_orderkey"),
        key="o_orderkey",
    ).select(
        "o_orderkey", F.expr(_ip_expr(_spark_oct, "o_orderkey")).alias("ip")
    )
    prefixes = _spark_prefixes(spark, sf_dir)
    ladder = prefixes.agg(F.sort_array(F.collect_set("plen")).alias("plens"))
    cands = (
        ips.crossJoin(F.broadcast(ladder))
        .select("o_orderkey", "ip", F.explode("plens").alias("plen"))
        .withColumn(
            "start",
            F.expr("ip - ip % shiftleft(CAST(1 AS BIGINT), 32 - plen)"),
        )
    )
    hits = cands.join(F.broadcast(prefixes), ["start", "plen"])
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


# ------------------------------------------------------------------
# IPv6 — the OTHER half of the data the reference archives
# ------------------------------------------------------------------
# Two of the reference's three RouteViews datasets are pfx2as for
# IPv4 AND IPv6 (/root/reference/download/downloader.go:87-93,
# routeviews.go:15-21 — `RouteViewIPv6/current/routeview.pfx2as.gz`);
# everything above consumes only the v4 half.  A 128-bit address is
# represented as a (hi, lo) BIGINT pair — hi carries the routing
# prefix (real-world BGP v6 announcements are /16../64, i.e. entirely
# inside the top 64 bits), lo carries the interface identifier.  The
# nibble ladder is /16, /32, /48, /64 — the allocation boundaries the
# registries actually delegate on — so LPM is again ONE broadcast
# equi-join over exploded (start_hi, plen) candidates: masks touch hi
# only, lo never participates in matching, and no range predicate
# exists anywhere.  Group values are kept small enough that hi stays
# far below 2^63 (no signed-overflow dialect traps).

_G1_MOD = 8    # bits 63..48 — 8 slots, nations cover all of them
_G2_MOD = 16   # bits 47..32 — 128 /32 slots, ~100 suppliers
_G3_MOD = 32   # bits 31..16 — 4096 /48 slots, ~1.5k customers
_G4_MOD = 16   # bits 15..0  — 65536 /64 slots, ~2k parts (sparse tail)

_P48 = 281474976710656  # 2^48
_P32 = 4294967296       # 2^32
_P16 = 65536            # 2^16


def _hi_expr(oct_fn, key_sql: str) -> str:
    """Top 64 bits of the derived v6 LOOKUP address as pure BIGINT
    arithmetic, identical in both engines.  Max value is
    < 8 * 2^48 ≈ 2.3e15 — comfortably positive in signed 64-bit.
    Tags are distinct from the prefix-side tags (a6..d6) so a lookup
    key that happens to equal a generator key does not trivially
    collide with "its" /64 (same reason v4 uses "a" vs "a16")."""
    g1 = oct_fn("x6", key_sql, _G1_MOD)
    g2 = oct_fn("y6", key_sql, _G2_MOD)
    g3 = oct_fn("z6", key_sql, _G3_MOD)
    g4 = oct_fn("w6", key_sql, _G4_MOD)
    return (
        f"({g1}) * {_P48} + ({g2}) * {_P32} + ({g3}) * {_P16} + ({g4})"
    )


def _lo_expr(oct_fn, key_sql: str) -> str:
    """Interface-identifier half: a 60-bit hash (never > 2^60, so no
    sign traps) that matching NEVER consults — it exists so the
    scalar surface has real host bits to format and split."""
    g = oct_fn("lo6", key_sql, 1152921504606846976)  # 2^60
    return f"({g})"


_DUCK_PREFIXES6 = f"""
    q16 AS (
      SELECT (n_nationkey % {_G1_MOD}) * {_P48} AS start_hi,
             16 AS plen, min(60000 + n_nationkey) AS asn
      FROM nation GROUP BY 1, 2
    ),
    q32 AS (
      SELECT {_duck_oct("a6", "s_suppkey", _G1_MOD)} * {_P48}
             + {_duck_oct("b6", "s_suppkey", _G2_MOD)} * {_P32} AS start_hi,
             32 AS plen, min(70000 + s_suppkey) AS asn
      FROM supplier GROUP BY 1, 2
    ),
    q48 AS (
      SELECT {_duck_oct("a6", "c_custkey", _G1_MOD)} * {_P48}
             + {_duck_oct("b6", "c_custkey", _G2_MOD)} * {_P32}
             + {_duck_oct("c6", "c_custkey", _G3_MOD)} * {_P16} AS start_hi,
             48 AS plen, min(400000 + c_custkey) AS asn
      FROM customer GROUP BY 1, 2
    ),
    q44 AS (
      SELECT {_duck_oct("a6", "c_custkey", _G1_MOD)} * {_P48}
             + {_duck_oct("b6", "c_custkey", _G2_MOD)} * {_P32}
             + {_duck_oct("e6", "c_custkey", 2)} * 1048576 AS start_hi,
             44 AS plen, min(500000 + c_custkey) AS asn
      FROM customer WHERE c_custkey % 17 = 0 GROUP BY 1, 2
    ),
    q64 AS (
      SELECT {_duck_oct("a6", "p_partkey", _G1_MOD)} * {_P48}
             + {_duck_oct("b6", "p_partkey", _G2_MOD)} * {_P32}
             + {_duck_oct("c6", "p_partkey", _G3_MOD)} * {_P16}
             + {_duck_oct("d6", "p_partkey", _G4_MOD)} AS start_hi,
             64 AS plen, min(900000 + p_partkey) AS asn
      FROM part GROUP BY 1, 2
    ),
    prefixes6 AS (
      SELECT * FROM q16 UNION ALL SELECT * FROM q32
      UNION ALL SELECT * FROM q44
      UNION ALL SELECT * FROM q48 UNION ALL SELECT * FROM q64
    )
"""


def _spark_prefixes6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(start_hi, plen, asn) at the registry boundaries /16 /32 /48
    /64 PLUS a deliberately off-boundary /44 (bit 20 lives inside the
    third group) — real v6 announcements are not confined to nibble
    boundaries, and the matcher must take its ladder from the data.
    Deduplicated per network with the minimum ASN."""
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    q16 = nation.groupBy(
        (F.expr(f"n_nationkey % {_G1_MOD}") * F.lit(_P48)).alias("start_hi"),
        F.lit(16).alias("plen"),
    ).agg(F.min(F.expr("60000 + n_nationkey")).alias("asn"))
    q32 = supplier.groupBy(
        F.expr(
            f"{_spark_oct('a6', 's_suppkey', _G1_MOD)} * {_P48}"
            f" + {_spark_oct('b6', 's_suppkey', _G2_MOD)} * {_P32}"
        ).alias("start_hi"),
        F.lit(32).alias("plen"),
    ).agg(F.min(F.expr("70000 + s_suppkey")).alias("asn"))
    q48 = customer.groupBy(
        F.expr(
            f"{_spark_oct('a6', 'c_custkey', _G1_MOD)} * {_P48}"
            f" + {_spark_oct('b6', 'c_custkey', _G2_MOD)} * {_P32}"
            f" + {_spark_oct('c6', 'c_custkey', _G3_MOD)} * {_P16}"
        ).alias("start_hi"),
        F.lit(48).alias("plen"),
    ).agg(F.min(F.expr("400000 + c_custkey")).alias("asn"))
    q44 = customer.filter(F.expr("c_custkey % 17 = 0")).groupBy(
        F.expr(
            f"{_spark_oct('a6', 'c_custkey', _G1_MOD)} * {_P48}"
            f" + {_spark_oct('b6', 'c_custkey', _G2_MOD)} * {_P32}"
            f" + {_spark_oct('e6', 'c_custkey', 2)} * 1048576"
        ).alias("start_hi"),
        F.lit(44).alias("plen"),
    ).agg(F.min(F.expr("500000 + c_custkey")).alias("asn"))
    q64 = part.groupBy(
        F.expr(
            f"{_spark_oct('a6', 'p_partkey', _G1_MOD)} * {_P48}"
            f" + {_spark_oct('b6', 'p_partkey', _G2_MOD)} * {_P32}"
            f" + {_spark_oct('c6', 'p_partkey', _G3_MOD)} * {_P16}"
            f" + {_spark_oct('d6', 'p_partkey', _G4_MOD)}"
        ).alias("start_hi"),
        F.lit(64).alias("plen"),
    ).agg(F.min(F.expr("900000 + p_partkey")).alias("asn"))
    return (
        q16.unionByName(q32).unionByName(q44)
        .unionByName(q48).unionByName(q64)
        .localCheckpoint()
    )


@query(
    "join_ip_prefix6",
    oracle=f"""
    WITH {_DUCK_PREFIXES6},
    ips AS (
      SELECT o_orderkey,
             {_hi_expr(_duck_oct, "o_orderkey")} AS ip_hi,
             {_lo_expr(_duck_oct, "o_orderkey")} AS ip_lo
      FROM orders
    ),
    cands AS (
      SELECT o_orderkey, ip_hi, ip_lo,
             ip_hi - ip_hi % (CAST(1 AS BIGINT) << (64 - plen)) AS start_hi,
             plen
      FROM ips CROSS JOIN (SELECT DISTINCT plen FROM prefixes6) lp
    ),
    hits AS (
      SELECT c.o_orderkey, c.ip_hi, c.ip_lo, c.plen, p.asn
      FROM cands c
      JOIN prefixes6 p ON p.start_hi = c.start_hi AND p.plen = c.plen
    )
    SELECT o_orderkey, ip_hi, ip_lo,
           CAST(max(plen) AS INT) AS matched_len,
           max_by(asn, plen) AS asn
    FROM hits
    GROUP BY o_orderkey, ip_hi, ip_lo
    """,
    tags=("network", "join", "reference-domain"),
)
def join_ip_prefix6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv6 longest-prefix-match IP→AS annotation — the consumer of
    the v6 pfx2as files the reference fetches alongside v4
    (/root/reference/download/downloader.go:87-93: the
    `RouteViewIPv6/current/routeview.pfx2as.gz` latest-pointer).

    Same data-driven-ladder recipe as ``join_ip_prefix``, lifted to
    128 bits: the address is a (hi, lo) BIGINT pair, the candidate
    ladder is the DISTINCT plens present in the (broadcast) prefix
    dim — here /16 /32 /48 /64 registry boundaries PLUS the planted
    off-boundary /44 a fixed nibble ladder would silently miss (all
    inside hi, so lo never participates in matching).  Each IP
    explodes to exactly |distinct plens| (start_hi, plen) candidates
    by pure mask arithmetic against the one-row collect_set anchor,
    the deduplicated prefix dim broadcasts, and one struct-max
    aggregate keeps the deepest match.  No range predicate, no
    128-bit arithmetic, no skew sensitivity: per-IP work is
    O(|plens|) ≤ 129 regardless of how many announcements cover a
    popular /16."""
    # spread before the md5-octet (hi, lo) derivation — same posture
    # and rationale as join_ip_prefix above
    ips = spread(
        load_table(spark, sf_dir, "orders").select("o_orderkey"),
        key="o_orderkey",
    ).select(
        "o_orderkey",
        F.expr(_hi_expr(_spark_oct, "o_orderkey")).alias("ip_hi"),
        F.expr(_lo_expr(_spark_oct, "o_orderkey")).alias("ip_lo"),
    )
    prefixes6 = _spark_prefixes6(spark, sf_dir)
    ladder = prefixes6.agg(
        F.sort_array(F.collect_set("plen")).alias("plens")
    )
    cands = (
        ips.crossJoin(F.broadcast(ladder))
        .select("o_orderkey", "ip_hi", "ip_lo", F.explode("plens").alias("plen"))
        .withColumn(
            "start_hi",
            F.expr(
                "ip_hi - ip_hi % shiftleft(CAST(1 AS BIGINT), 64 - plen)"
            ),
        )
    )
    hits = cands.join(F.broadcast(prefixes6), ["start_hi", "plen"])
    best = hits.groupBy("o_orderkey", "ip_hi", "ip_lo").agg(
        F.max(F.struct(F.col("plen"), F.col("asn"))).alias("m")
    )
    return best.select(
        "o_orderkey",
        "ip_hi",
        "ip_lo",
        F.col("m.plen").cast("int").alias("matched_len"),
        F.col("m.asn").alias("asn"),
    )


def _hex_groups_duck(col: str, top: str) -> str:
    """Four colon-separated lower-hex 16-bit groups of a BIGINT."""
    gs = [
        f"lpad(printf('%x', {top}), 4, '0')",
        f"lpad(printf('%x', ({col} // {_P32}) % 65536), 4, '0')",
        f"lpad(printf('%x', ({col} // 65536) % 65536), 4, '0')",
        f"lpad(printf('%x', {col} % 65536), 4, '0')",
    ]
    return " || ':' || ".join(gs)


def _hex_groups_spark(col: str, top: str) -> str:
    gs = [
        f"lpad(format_string('%x', {top}), 4, '0')",
        f"lpad(format_string('%x', ({col} DIV {_P32}) % 65536), 4, '0')",
        f"lpad(format_string('%x', ({col} DIV 65536) % 65536), 4, '0')",
        f"lpad(format_string('%x', {col} % 65536), 4, '0')",
    ]
    return " || ':' || ".join(gs)


@query(
    "scalar_ip6",
    oracle=f"""
    WITH ips AS (
      SELECT o_orderkey,
             {_hi_expr(_duck_oct, "o_orderkey")} AS ip_hi,
             {_lo_expr(_duck_oct, "o_orderkey")} AS ip_lo
      FROM orders
    )
    SELECT o_orderkey, ip_hi, ip_lo,
           {_hex_groups_duck("ip_hi", f"ip_hi // {_P48}")} || ':' ||
           {_hex_groups_duck("ip_lo", f"ip_lo // {_P48}")} AS colon_hex,
           ip_hi AS net64,
           ip_hi - ip_hi % {_P48} AS net16,
           CASE WHEN ip_hi % {_P32} < {_P16} THEN 1 ELSE 0 END
             AS in_low_slash32
    FROM ips
    """,
    tags=("network", "scalar", "reference-domain"),
)
def scalar_ip6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv6 scalar surface over the derived (hi, lo) pairs: full-form
    (uncompressed — no `::` zero-run folding, which is a presentation
    choice RFC 5952 makes optional) colon-hex formatting of all eight
    16-bit groups, the /64 network vs interface-identifier split that
    v6 addressing is built around, the /16 registry block, and a
    containment predicate — all pure integer div/mod + printf so both
    engines agree byte-for-byte."""
    # spread: 10 md5 octet derivations + hex formatting per row are
    # map-side CPU stuck in the single-split scan task otherwise
    ips = spread(
        load_table(spark, sf_dir, "orders").select("o_orderkey"),
    ).select(
        "o_orderkey",
        F.expr(_hi_expr(_spark_oct, "o_orderkey")).alias("ip_hi"),
        F.expr(_lo_expr(_spark_oct, "o_orderkey")).alias("ip_lo"),
    )
    return ips.select(
        "o_orderkey",
        "ip_hi",
        "ip_lo",
        F.expr(
            f"{_hex_groups_spark('ip_hi', f'ip_hi DIV {_P48}')} || ':' || "
            f"{_hex_groups_spark('ip_lo', f'ip_lo DIV {_P48}')}"
        ).alias("colon_hex"),
        F.col("ip_hi").alias("net64"),
        F.expr(f"ip_hi - ip_hi % {_P48}").alias("net16"),
        F.expr(
            f"CASE WHEN ip_hi % {_P32} < {_P16} THEN 1 ELSE 0 END"
        ).alias("in_low_slash32"),
    )


def _pfx2as6_lines_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The v6 prefix dimension rendered as REAL pfx2as-format text
    lines — ``<exploded-v6-prefix>\\t<len>\\t<asn>`` — the byte shape
    of `routeview.pfx2as.gz` the reference fetches
    (/root/reference/download/routeviews.go:15-21).  Line synthesis
    is fixture plumbing (production reads the fetched file); the
    OPERATOR under test is the parse in ``parse_pfx2as6``."""
    net = _spark_prefixes6(spark, sf_dir)
    hexpfx = (
        f"{_hex_groups_spark('start_hi', f'start_hi DIV {_P48}')}"
        " || ':0000:0000:0000:0000'"
    )
    return net.select(
        F.expr(
            f"concat({hexpfx}, '\\t', CAST(plen AS STRING),"
            " '\\t', CAST(asn AS STRING))"
        ).alias("line")
    )


@query(
    "parse_pfx2as6",
    oracle=f"""
    WITH {_DUCK_PREFIXES6}
    SELECT start_hi, CAST(plen AS INT) AS plen, asn FROM prefixes6
    """,
    tags=("network", "parse", "reference-domain"),
)
def parse_pfx2as6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse v6 pfx2as text lines back into the (start_hi, plen, asn)
    prefix dimension the LPM join consumes — the ingest step between
    the reference's fetched `RouteViewIPv6/.../routeview.pfx2as.gz`
    bytes and ``join_ip_prefix6``.  The whole parse is JVM-side
    codegen: split on tab, split the exploded address on ':', and
    ``conv(group, 16, 10)`` each 16-bit group into the hi BIGINT with
    pure arithmetic — a regex/group-weight/base-conversion bug lands
    a wrong start_hi.

    Differential: the oracle never sees a line — it emits the
    generator values closed-form, so engine-side line rendering AND
    parsing must both be exact for the hash to match.

    Scale shape: map-only (no exchange besides the generators'
    dedup); at 100 TB of archived snapshots this is the per-file
    parse stage of a partitioned text scan."""
    lines = _pfx2as6_lines_spark(spark, sf_dir)
    parts = lines.select(
        F.expr("split(line, '\\t')").alias("f")
    ).select(
        F.expr("split(f[0], ':')").alias("g"),
        F.expr("CAST(f[1] AS INT)").alias("plen"),
        F.expr("CAST(f[2] AS BIGINT)").alias("asn"),
    )
    return parts.select(
        F.expr(
            f"CAST(conv(g[0], 16, 10) AS BIGINT) * {_P48}"
            f" + CAST(conv(g[1], 16, 10) AS BIGINT) * {_P32}"
            f" + CAST(conv(g[2], 16, 10) AS BIGINT) * {_P16}"
            f" + CAST(conv(g[3], 16, 10) AS BIGINT)"
        ).alias("start_hi"),
        "plen",
        "asn",
    )


@query(
    "agg_as_traffic",
    oracle=f"""
    WITH {_DUCK_PREFIXES},
    ips AS (
      SELECT o_orderkey, {_ip_expr(_duck_oct, "o_orderkey")} AS ip
      FROM orders
    ),
    cands AS (
      SELECT o_orderkey,
             ip - ip % (CAST(1 AS BIGINT) << (32 - plen)) AS start, plen
      FROM ips CROSS JOIN (SELECT DISTINCT plen FROM prefixes) lp
    ),
    best4 AS (
      SELECT c.o_orderkey, max_by(p.asn, c.plen) AS asn
      FROM cands c JOIN prefixes p ON p.start = c.start AND p.plen = c.plen
      GROUP BY c.o_orderkey
    ),
    {_DUCK_PREFIXES6.lstrip().rstrip()},
    ips6 AS (
      SELECT o_orderkey, {_hi_expr(_duck_oct, "o_orderkey")} AS ip_hi
      FROM orders
    ),
    cands6 AS (
      SELECT o_orderkey,
             ip_hi - ip_hi % (CAST(1 AS BIGINT) << (64 - plen)) AS start_hi,
             plen
      FROM ips6 CROSS JOIN (SELECT DISTINCT plen FROM prefixes6) lp
    ),
    best6 AS (
      SELECT c.o_orderkey, max_by(p.asn, c.plen) AS asn
      FROM cands6 c
      JOIN prefixes6 p ON p.start_hi = c.start_hi AND p.plen = c.plen
      GROUP BY c.o_orderkey
    ),
    tagged AS (
      SELECT 'v4' AS family, asn FROM best4
      UNION ALL SELECT 'v6', asn FROM best6
    ),
    counted AS (
      SELECT family, asn, CAST(count(*) AS BIGINT) AS n_ips
      FROM tagged GROUP BY family, asn
    )
    SELECT family, asn, n_ips,
           CAST(n_ips * 1000000 //
                sum(n_ips) OVER (PARTITION BY family) AS BIGINT)
             AS share_ppm
    FROM counted
    """,
    tags=("network", "aggregate", "reference-domain"),
)
def agg_as_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-AS traffic report across BOTH address families — the
    operational rollup RouteViews pfx2as consumers actually build
    (how much measured traffic originates from each AS), composing
    the engine's own v4 and v6 LPM joins end-to-end: annotate every
    derived IP with its most-specific origin AS, then count and
    share-of-family per ASN.

    Scale shape: both LPM joins keep their broadcast-ladder posture
    (per-IP O(ladder)); the rollup shuffles one (family, asn) pair
    per IP with map-side partial counts, and the family share is a
    two-value-partition window over the ALREADY-aggregated per-AS
    rows (|ASNs| rows, not |IPs|)."""
    # The two family plans are independent until the union, and each
    # builder eagerly checkpoints its own prefix dimension — build
    # them on two driver threads so the dimension-materialization
    # jobs overlap instead of queueing (guide §2.6; plan construction
    # and checkpoint order are invisible to the consuming plan).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f4 = pool.submit(join_ip_prefix, spark, sf_dir)
        f6 = pool.submit(join_ip_prefix6, spark, sf_dir)
        v4 = f4.result().select(F.lit("v4").alias("family"), "asn")
        v6 = f6.result().select(F.lit("v6").alias("family"), "asn")
    counted = (
        v4.unionByName(v6).groupBy("family", "asn").agg(
            F.count(F.lit(1)).alias("n_ips")
        )
    )
    return counted.select(
        "family",
        "asn",
        "n_ips",
        F.expr(
            "CAST(n_ips * 1000000 DIV sum(n_ips)"
            " OVER (PARTITION BY family) AS BIGINT)"
        ).alias("share_ppm"),
    )
