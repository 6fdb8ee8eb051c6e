"""Round-14 keys: the lake's own DATA pages read from scratch, and
the crawl chain's charset stage.

Extends the round-13 parquet FOOTER reader (metadata only) down to
the bytes: page headers, from-scratch snappy block decompression,
RLE/bit-packed definition levels and dictionary indices, PLAIN value
decode — see downloader_spark/media.py.  (Reference lineage: the
fetched archives are opaque byte streams at
/root/reference/download/common.go:106; decoding them is the
downstream consumer this engine adds.)  Registry contract as
everywhere: a Spark-first plan plus an independently-constructed
DuckDB oracle, never the same SQL twice.
"""

from __future__ import annotations

import hashlib

import pandas as pd  # noqa: F401 — resolves stringified UDF type hints

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.plans.registry import query

# ------------------------------------------------------------------
# multimodal_parquet_pages — column values straight off the bytes
# ------------------------------------------------------------------

# (table, column) pairs to decode: one integer and one string column
# per fixture table, covering INT32, INT64 and BYTE_ARRAY physical
# types, dictionary-encoded and PLAIN-fallback pages, across sizes
# from 5 rows to the largest fact table.
_PQ_PAGE_COLS = (
    ("region", "r_regionkey", "int"),
    ("region", "r_name", "str"),
    ("nation", "n_nationkey", "int"),
    ("nation", "n_name", "str"),
    ("orders", "o_orderkey", "int"),
    ("orders", "o_orderpriority", "str"),
    ("lineitem", "l_orderkey", "int"),
    ("lineitem", "l_returnflag", "str"),
    ("documents", "doc_id", "int"),
    ("documents", "text", "str"),
    ("events", "user_id", "int"),
    ("events", "event_type", "str"),
)

# Intra-chunk split width for the pages audit: each (file, column)
# fans out to this many page-group tasks (task g decodes data pages
# with index % groups == g).  8 covers the deepest fixture chunk (5
# data pages) with headroom; on a real lake the same explode bounds
# the per-task decode at ~pages/groups regardless of chunk size.
_PQ_PAGE_GROUPS = 8


def _h40_py(payload: bytes) -> int:
    """40-bit md5 prefix; per-file partial sums are reduced mod 2^40
    so the check survives ANY row count (a raw sum overflows BIGINT
    past ~9M rows/column — sf10 lineitem would wrap on the Spark side
    while DuckDB's HUGEINT->BIGINT cast aborts)."""
    return int(hashlib.md5(payload).hexdigest()[:10], 16)


_H40_MOD = 1 << 40


def _h40_duck(expr: str) -> str:
    return f"CAST(concat('0x', substring(md5({expr}), 1, 10)) AS BIGINT)"


def _pages_oracle() -> str:
    parts = []
    for tbl, col, kind in _PQ_PAGE_COLS:
        val = f"CAST({col} AS VARCHAR)" if kind == "int" else col
        parts.append(
            f"""
    SELECT '{tbl}' AS tbl, '{col}' AS col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({col}) AS BIGINT) AS null_count,
           CAST(sum({_h40_duck(val)}) % {_H40_MOD} AS BIGINT)
             AS value_hash_sum
    FROM {tbl}"""
        )
    return " UNION ALL ".join(parts)


@query(
    "multimodal_parquet_pages",
    oracle=_pages_oracle(),
    tags=("multimodal", "parquet", "pages", "snappy", "mapInPandas"),
)
def multimodal_parquet_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet DATA pages decoded from scratch — the layer below the
    round-13 footer key: a binaryFile scan of the fixture tables feeds
    media.read_parquet_column, which walks each column chunk's pages
    (Thrift-compact page headers), decompresses them with the
    FROM-SCRATCH snappy block decoder (varint preamble, 2-bit-tagged
    literals and overlapping back-references; gzip pages route through
    the round-13 inflate), decodes definition levels and dictionary
    indices with the RLE/bit-packed hybrid, and materializes values
    via PLAIN decode of the dictionary (or of plain-fallback pages).

    The differential is the strongest available: per column, the SUM
    of a 40-bit md5 over every decoded value, reduced mod 2^40 (ints
    rendered as decimal strings, strings hashed as their utf-8 bytes)
    must equal DuckDB's same sum over its OWN scan of the same file — one wrong
    snappy copy offset, one mis-decoded RLE run, one off-by-one in a
    byte-array length and the sums diverge.  Covers INT32/INT64/
    BYTE_ARRAY, dictionary and PLAIN pages, 5-row to largest-fact
    files.

    At 100 TB this layer IS the scan: engines that cannot decode
    pages cannot prune, vectorize, or verify a lake.  Shape: a
    binaryFile LISTING (path only — no payload crosses any exchange,
    guide §8 "shuffle keys and metadata instead of payloads") fanned
    out to one row per (file, COLUMN, PAGE-GROUP) via a broadcast
    join against the tiny column dim plus an 8-way page-group
    explode — so a fat fact column's PAGES hash in
    parallel tasks instead of serially in one (the former per-(file,
    column) grain left the largest column chunk as a one-task
    straggler); each task range-reads its file from storage and
    decodes only its modulo share of page bodies
    (read_parquet_column_page_group), then PER-(FILE, COLUMN, GROUP)
    PARTIALS — all order-free sums — merge in one map-side-
    combinable aggregation, the split → partial → merge shape a
    100 TB audit actually runs."""
    import os

    from downloader_spark.media import read_parquet_column_page_group

    tables = sorted({t for t, _c, _k in _PQ_PAGE_COLS})
    paths = [os.path.join(sf_dir, f"{t}.parquet") for t in tables]
    n = spark.sparkContext.defaultParallelism
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(paths)
        .select("path")
    )
    # owning table, JVM-side: /x/documents.parquet (one file) OR
    # /x/documents.parquet/part-0007.parquet (directory of parts)
    base = F.regexp_replace(
        F.regexp_extract("path", r"([^/]+)/?$", 1), r"\.parquet$", ""
    )
    parent = F.regexp_replace(
        F.regexp_extract("path", r"([^/]+)/[^/]+/?$", 1),
        r"\.parquet$", "",
    )
    col_dim = spark.createDataFrame(
        list(_PQ_PAGE_COLS), "tbl string, col string, kind string"
    )
    work = (
        files.withColumn(
            "tbl", F.when(base.isin(tables), base).otherwise(parent)
        )
        .join(F.broadcast(col_dim), "tbl")
        .withColumn(
            "grp",
            F.explode(
                F.array(*[F.lit(i) for i in range(_PQ_PAGE_GROUPS)])
            ),
        )
        .repartition(n)
    )

    def run(batches):
        from collections import Counter
        from hashlib import md5

        fb = int.from_bytes
        raw_path = None  # one-file cache: rows for a path often batch
        raw = b""
        for pdf in batches:
            out = []
            for tbl, col, kind, path, grp in zip(
                pdf["tbl"], pdf["col"], pdf["kind"], pdf["path"], pdf["grp"]
            ):
                if path != raw_path:
                    lp = path[5:] if path.startswith("file:") else path
                    with open(lp, "rb") as f:
                        raw = f.read()
                    raw_path = path
                values = read_parquet_column_page_group(
                    raw, col, int(grp), _PQ_PAGE_GROUPS
                )
                nulls = values.count(None)
                # 40-bit md5 prefix == big-endian first 5 digest
                # bytes; C-level int formatting and bound locals keep
                # the per-value cost at the md5 call itself.  For
                # repetition-heavy columns (the dictionary-encoded
                # common case — flags, priorities, enum names) hash
                # each DISTINCT value once and multiply by its count:
                # sum(c_v * h(v)) == sum over rows, integer-exact and
                # order-free, at one dict insert (~0.1 us) instead of
                # one md5+format (~1 us) per repeated row.  A 1k-row
                # probe picks the path so unique-key columns skip the
                # Counter overhead.
                probe = values[:1024]
                if probe and len(set(probe)) * 2 <= len(probe):
                    items = Counter(values).items()
                    if kind == "int":
                        hsum = sum(
                            c * fb(md5(b"%d" % v).digest()[:5], "big")
                            for v, c in items
                            if v is not None
                        )
                    else:
                        hsum = sum(
                            c * fb(md5(v).digest()[:5], "big")
                            for v, c in items
                            if v is not None
                        )
                elif kind == "int":
                    hsum = sum(
                        fb(md5(b"%d" % v).digest()[:5], "big")
                        for v in values
                        if v is not None
                    )
                else:
                    hsum = sum(
                        fb(md5(v).digest()[:5], "big")
                        for v in values
                        if v is not None
                    )
                out.append(
                    (tbl, col, len(values), nulls, hsum % _H40_MOD)
                )
            yield pd.DataFrame(
                out,
                columns=["tbl", "col", "n_rows", "null_count", "value_hash_sum"],
            )

    partials = work.select("tbl", "col", "kind", "path", "grp").mapInPandas(
        run,
        "tbl string, col string, n_rows long, null_count long,"
        " value_hash_sum long",
    )
    # partials are < 2^40, so the merge sum stays inside BIGINT up to
    # ~8M part files per table; the final pmod matches the oracle's
    return partials.groupBy("tbl", "col").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("null_count").alias("null_count"),
        F.expr(
            f"CAST(pmod(sum(value_hash_sum), {_H40_MOD}) AS BIGINT)"
        ).alias("value_hash_sum"),
    )


# ------------------------------------------------------------------
# text_charset_detect — BOM / meta / byte-heuristic charset sniffing
# ------------------------------------------------------------------

# Planted encodings per doc_id % 6.  Cases 2 and 4 prepend a latin-1
# 'café ' so the transcode is byte-real (0xE9 is invalid leading
# UTF-8, which is what forces case 4 down the heuristic branch).
_CAFE = "café "
_META_UTF8 = '<meta charset="utf-8">'
_META_LATIN = '<meta charset="iso-8859-1">'


def _charset_case(doc_id: int) -> int:
    return doc_id % 6


def _synth_page_text(case: int, text: str) -> str:
    body = _CAFE + text if case in (2, 4) else text
    esc = (
        body.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    meta = {0: _META_UTF8, 2: _META_LATIN}.get(case, "")
    return f"<html><head>{meta}</head><body>{esc}</body></html>"


def _encode_page(case: int, page: str) -> bytes:
    if case == 1:
        return b"\xef\xbb\xbf" + page.encode("utf-8")
    if case in (2, 4):
        return page.encode("latin-1")
    if case == 3:
        return b"\xff\xfe" + page.encode("utf-16-le")
    return page.encode("utf-8")


def sniff_charset(raw: bytes) -> tuple[str, str, str]:
    """From-scratch charset detection for crawl payloads, in the
    precedence real extractors use: (1) a byte-order mark wins
    outright, (2) an HTML meta-charset declaration in the first 1 KiB
    (scanned as latin-1, which is byte-transparent), (3) byte
    heuristic — strict UTF-8 validation, falling back to latin-1,
    which decodes any byte sequence.  Returns (charset, method,
    decoded_text)."""
    import re as _re

    if raw.startswith(b"\xef\xbb\xbf"):
        return "utf-8", "bom", raw[3:].decode("utf-8")
    if raw.startswith(b"\xff\xfe"):
        return "utf-16-le", "bom", raw[2:].decode("utf-16-le")
    if raw.startswith(b"\xfe\xff"):
        return "utf-16-be", "bom", raw[2:].decode("utf-16-be")
    head = raw[:1024].decode("latin-1")
    m = _re.search(r'<meta\s+charset="([^"]+)"', head, _re.I)
    if m:
        import codecs as _codecs

        cs = m.group(1).lower()
        try:  # pages lie: an unknown name falls through to heuristics
            _codecs.lookup(cs)
        except LookupError:
            pass
        else:
            return cs, "meta", raw.decode(cs)
    try:
        return "utf-8", "heuristic", raw.decode("utf-8")
    except UnicodeDecodeError:
        return "iso-8859-1", "heuristic", raw.decode("latin-1")


_CS_CHARSET_SQL = """CASE doc_id % 6
      WHEN 2 THEN 'iso-8859-1' WHEN 4 THEN 'iso-8859-1'
      WHEN 3 THEN 'utf-16-le' ELSE 'utf-8' END"""
_CS_METHOD_SQL = """CASE doc_id % 6
      WHEN 0 THEN 'meta' WHEN 2 THEN 'meta'
      WHEN 1 THEN 'bom' WHEN 3 THEN 'bom' ELSE 'heuristic' END"""


def _duck_page_expr() -> str:
    body = (
        "CASE WHEN doc_id % 6 IN (2, 4)"
        f" THEN 'café ' || text ELSE text END"
    )
    esc = (
        "replace(replace(replace("
        + body
        + ", '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    )
    meta = (
        "CASE doc_id % 6 WHEN 0 THEN '<meta charset=\"utf-8\">'"
        " WHEN 2 THEN '<meta charset=\"iso-8859-1\">' ELSE '' END"
    )
    return (
        f"'<html><head>' || {meta} || '</head><body>' || {esc}"
        " || '</body></html>'"
    )


@query(
    "text_charset_detect",
    oracle=f"""
    WITH pages AS (
      SELECT doc_id, {_duck_page_expr()} AS page FROM documents
    )
    SELECT doc_id,
           {_CS_CHARSET_SQL} AS charset,
           {_CS_METHOD_SQL} AS method,
           md5(page) AS page_md5,
           CAST(CASE doc_id % 6
                WHEN 1 THEN strlen(page) + 3
                WHEN 2 THEN length(page)
                WHEN 3 THEN 2 * length(page) + 2
                WHEN 4 THEN length(page)
                ELSE strlen(page) END AS BIGINT) AS n_raw_bytes
    FROM pages
    """,
    tags=("llm", "text", "charset", "crawl", "mapInPandas"),
)
def text_charset_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniff + transcode — the stage between the WARC record
    walk and HTML extraction that round 13's crawl chain assumed away
    (clean UTF-8): each doc's page is synthesized and then ENCODED in
    one of six planted shapes (UTF-8 with meta, UTF-8 BOM, latin-1
    with meta, UTF-16-LE BOM, bare latin-1 with a high byte, bare
    UTF-8), and the from-scratch sniffer (BOM > meta-tag-in-1KiB >
    strict-UTF-8-else-latin-1 heuristic) must both NAME the charset/
    method and TRANSCODE the bytes back to the exact page string,
    witnessed by md5 against the oracle's direct construction — a
    wrong branch or a mojibake'd é flips the hash.  The latin-1 cases
    carry a genuine non-ASCII byte (0xE9) so 'decode as UTF-8 and
    hope' visibly fails.

    Shape: one Arrow map stage over (doc_id, text); no shuffle.
    Differential: the oracle builds the page STRING in SQL and never
    sees bytes, a BOM, or a decoder.

    Fixture precondition (same family as text_html_strip's): document
    text must be latin-1-ENCODABLE for the planted cases 2/4 to
    exist — true of the ASCII driver fixtures; a corpus with wider
    scripts would plant those cases only on encodable docs."""
    import hashlib as _hl

    n = spark.sparkContext.defaultParallelism
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(n)
    )

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                case = _charset_case(d)
                if case in (2, 4):
                    # the planted latin-1 cases only exist for
                    # latin-1-encodable text; fail with the
                    # precondition's NAME, not a bare UnicodeError
                    # from deep inside the synthesis
                    try:
                        str(text).encode("latin-1")
                    except UnicodeEncodeError as exc:
                        raise ValueError(
                            "text_charset_detect fixture precondition"
                            f" violated: doc {d} text is not"
                            " latin-1-encodable (cases 2/4 plant"
                            " latin-1 pages; re-plant on encodable"
                            " docs for wider-script corpora)"
                        ) from exc
                page = _synth_page_text(case, str(text))
                raw = _encode_page(case, page)
                cs, method, decoded = sniff_charset(raw)
                if decoded != page:  # transcode must be lossless
                    raise ValueError(
                        f"charset transcode mismatch for doc {d}"
                        f" (case {case}, sniffed {cs}/{method})"
                    )
                out.append(
                    (
                        d,
                        cs,
                        method,
                        _hl.md5(decoded.encode("utf-8")).hexdigest(),
                        len(raw),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "charset", "method", "page_md5", "n_raw_bytes"],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, charset string, method string, page_md5 string,"
        " n_raw_bytes long",
    )


# ------------------------------------------------------------------
# pipeline_crawl — the multimodal crawl pipeline as ONE plan
# ------------------------------------------------------------------

_CRAWL_STOPS = ["the", "a", "and", "of", "to", "in", "is", "on"]


@query(
    "pipeline_crawl",
    oracle=f"""
    WITH dec AS (
      SELECT doc_id,
             CASE WHEN doc_id % 6 IN (2, 4)
                  THEN 'café ' || text ELSE text END AS t
      FROM documents
    ),
    feats AS (
      SELECT doc_id, t,
             CAST(len(list_filter(string_split_regex(t, ' +'),
                  w -> w <> '')) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(
                  list_filter(string_split_regex(t, ' +'), w -> w <> ''),
                  w -> len(w))), 0) AS BIGINT) AS sum_len,
             CAST(len(list_filter(list_filter(
                  string_split_regex(t, ' +'), w -> w <> ''),
                  w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
             CAST({" + ".join(f"CAST(list_contains(list_filter(string_split_regex(t, ' +'), w -> w <> ''), '{w}') AS INT)" for w in _CRAWL_STOPS)}
                  AS BIGINT) AS n_stop
      FROM dec
    ),
    gated AS (
      SELECT *,
             (n_words BETWEEN 40 AND 100000)
               AND (sum_len BETWEEN 3 * n_words AND 10 * n_words)
               AND (5 * n_alpha >= 4 * n_words)
               AND (n_stop >= 2) AS passes
      FROM feats
    )
    SELECT '1_scanned' AS stage, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    UNION ALL SELECT '2_decoded', CAST(count(*) AS BIGINT) FROM dec
    UNION ALL SELECT '3_extracted', CAST(count(*) AS BIGINT)
    FROM gated WHERE n_words > 0
    UNION ALL SELECT '4_quality', CAST(count(*) AS BIGINT)
    FROM gated WHERE passes
    UNION ALL SELECT '5_unique', CAST(count(DISTINCT md5(t)) AS BIGINT)
    FROM gated WHERE passes
    """,
    tags=("multimodal", "pipeline", "crawl", "composite"),
)
def pipeline_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END crawl pipeline as ONE declarative plan — the
    multimodal sibling of pipeline_corpus, composed from the engine's
    own proven layers: per doc, a real .warc.gz archive (warcinfo +
    response, one gzip member per record) is synthesized and then
    DECODED — from-scratch inflate + CRC, WARC record walk, charset
    sniff/transcode (the six planted encodings of
    text_charset_detect) — inside a single Arrow stage the payload
    bytes never leave; the decoded page then flows through JVM-side
    HTML extraction (strip tags, unescape entities amp-last, collapse
    whitespace), the Gopher rule bundle, and exact dedup, ending in a
    five-stage attrition report (scanned / decoded / extracted /
    quality / unique).

    Differential: the oracle recomputes every stage's count
    closed-form from documents.text — it never sees gzip, WARC, a
    charset, or HTML.  One wrong byte anywhere in the chain changes
    the extracted text, the rule counts, or the dedup groups.

    Scale shape: scan → Arrow map (bytes die here) → whole-stage
    codegen'd extraction + rules → one aggregation; the only exchange
    carries (flags, md5) pairs, and the distinct-count is over the
    already-gated survivors."""
    import hashlib as _hl  # noqa: F401

    from downloader_spark.media import (
        encode_gzip_member,
        encode_warc_record,
        gzip_members_decode,
        parse_warc_records,
    )

    n = spark.sparkContext.defaultParallelism
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(n)
    )

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                case = _charset_case(d)
                page = _synth_page_text(case, str(text))
                raw = _encode_page(case, page)
                info = encode_warc_record(
                    {"WARC-Type": "warcinfo"}, b"crawler: spark-graft\r\n"
                )
                resp = encode_warc_record(
                    {"WARC-Type": "response",
                     "WARC-Target-URI": f"http://fixture/{d}"},
                    raw,
                )
                archive = encode_gzip_member(info) + encode_gzip_member(resp)
                ok = False
                page_out = ""
                try:
                    records = []
                    for member in gzip_members_decode(archive):
                        records.extend(parse_warc_records(member))
                    payload = next(
                        p for h, p in records
                        if h.get("WARC-Type") == "response"
                    )
                    _cs, _method, page_out = sniff_charset(payload)
                    ok = True
                except (ValueError, StopIteration, UnicodeDecodeError):
                    pass
                out.append((d, ok, page_out))
            yield pd.DataFrame(out, columns=["doc_id", "decode_ok", "page"])

    decoded = docs.mapInPandas(
        run, "doc_id long, decode_ok boolean, page string"
    )
    stop_sum = " + ".join(
        f"CAST(array_contains(ws, '{w}') AS INT)" for w in _CRAWL_STOPS
    )
    extracted = decoded.selectExpr(
        "doc_id",
        "decode_ok",
        # strip tags FIRST, unescape entities amp-last, collapse
        "trim(regexp_replace(replace(replace(replace("
        "regexp_replace(page, '<[^>]+>', ''),"
        " '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),"
        " '\\\\s+', ' ')) AS t",
    )
    feats = extracted.selectExpr(
        "doc_id",
        "decode_ok",
        "t",
        "filter(split(t, ' +'), w -> w != '') AS ws",
    ).selectExpr(
        "doc_id",
        "decode_ok",
        "t",
        "CAST(size(ws) AS BIGINT) AS n_words",
        "CAST(aggregate(transform(ws, w -> length(w)), 0, (a, x) -> a + x)"
        " AS BIGINT) AS sum_len",
        "CAST(size(filter(ws, w -> w rlike '[a-zA-Z]')) AS BIGINT) AS n_alpha",
        f"CAST({stop_sum} AS BIGINT) AS n_stop",
    ).selectExpr(
        "doc_id",
        "decode_ok",
        "t",
        "n_words",
        "(n_words BETWEEN 40 AND 100000)"
        " AND (sum_len BETWEEN 3 * n_words AND 10 * n_words)"
        " AND (5 * n_alpha >= 4 * n_words)"
        " AND (n_stop >= 2) AS passes",
    )
    agg = feats.agg(
        F.count(F.lit(1)).alias("scanned"),
        F.sum(F.col("decode_ok").cast("long")).alias("decoded"),
        F.sum((F.col("n_words") > 0).cast("long")).alias("extracted"),
        F.sum(F.col("passes").cast("long")).alias("quality"),
        F.countDistinct(
            F.when(F.col("passes"), F.md5("t"))
        ).alias("uniq"),
    )
    return agg.selectExpr(
        "stack(5,"
        " '1_scanned', scanned,"
        " '2_decoded', decoded,"
        " '3_extracted', extracted,"
        " '4_quality', quality,"
        " '5_unique', uniq) AS (stage, n_docs)"
    ).selectExpr("stage", "CAST(n_docs AS BIGINT) AS n_docs")


# ------------------------------------------------------------------
# embed_ann_hnsw — hierarchical entry layer over the NSW graph
# ------------------------------------------------------------------
# Round 13's embed_ann_graph is a single-layer NSW: entry points are
# md5-seeded bucket representatives.  HNSW's contribution is the
# HIERARCHY: a sparse upper layer (every ~8th node, hash-selected) is
# itself a small-world graph; search greedily descends it first, so
# the base-layer beam starts NEAR the query instead of at a random
# representative.  Everything stays hash-deterministic and relational
# so the DuckDB oracle replays the whole descent bit-for-bit.

_HNSW_L1_MOD = 8   # layer-1 membership: h % 8 == 0 (~n/8 nodes)
_HNSW_M1 = 2       # layer-1 near out-degree within bucket
_HNSW_H1 = 2       # greedy descent hops on layer 1 (beam width 1)
_HNSW_NB1 = 2      # layer-1 bucket floor
_HNSW_BSZ1 = 62    # layer-1 target bucket size


def _hnsw_oracle() -> str:
    from downloader_spark.operators.llm_dedup import _duck_h60
    from downloader_spark.operators.llm_similarity import _DUCK_DOT
    from downloader_spark.operators.round7_ext import _ann_topk_cte
    from downloader_spark.operators.round13_ext import (
        _NSW_K,
        _nsw_duck_base,
        _nsw_duck_search,
    )

    def dot(a, b):
        return _DUCK_DOT.format(a=a, b=b)

    def h(tag, key):
        return _duck_h60(f"concat('{tag}:', CAST({key} AS VARCHAR))")

    score = (
        "SELECT t.query_id, t.node, "
        f"{dot('q.q_emb', 'c.embedding')} / (q.q_nrm * c.nrm) AS cos "
        "FROM {src} t JOIN c ON c.vec_id = t.node "
        "JOIN q ON q.query_id = t.query_id"
    )

    def top1(src):
        return f"""
      SELECT query_id, node FROM (
        SELECT query_id, node,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, node) AS rnk
        FROM {src}
      ) WHERE rnk <= 1"""

    descent = [
        f"""l1 AS (
      SELECT vec_id, embedding, nrm FROM c
      WHERE {h("hns1", "vec_id")} % {_HNSW_L1_MOD} = 0
    ),
    n1 AS (SELECT count(*) AS n1,
                  greatest({_HNSW_NB1}, count(*) // {_HNSW_BSZ1}) AS nb1
           FROM l1),
    l1b AS (
      SELECT vec_id, embedding, nrm,
             {h("hnsb1", "vec_id")} % nb1 AS bkt
      FROM l1, n1
    ),
    l1reps AS (SELECT bkt, min(vec_id) AS rep FROM l1b GROUP BY bkt),
    l1near AS (
      SELECT src, dst FROM (
        SELECT u.vec_id AS src, v.vec_id AS dst,
               row_number() OVER (
                 PARTITION BY u.vec_id
                 ORDER BY {dot("u.embedding", "v.embedding")}
                          / (u.nrm * v.nrm) DESC, v.vec_id
               ) AS rnk
        FROM l1b u JOIN l1b v
          ON u.bkt = v.bkt AND u.vec_id <> v.vec_id
      ) WHERE rnk <= {_HNSW_M1}
    ),
    l1long AS (
      SELECT t.src, r.rep AS dst
      FROM (SELECT l1.vec_id AS src,
                   {h("hnsl1", "l1.vec_id")} % n1.nb1 AS tbkt
            FROM l1, n1) t
      JOIN l1reps r ON r.bkt = t.tbkt
      WHERE r.rep <> t.src
    ),
    l1edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT * FROM l1near UNION ALL SELECT * FROM l1long
      )
    ),
    ge AS (
      SELECT coalesce((SELECT min(vec_id) FROM l1),
                      (SELECT min(vec_id) FROM c)) AS node
    ),
    dentry AS (SELECT q.query_id, ge.node FROM q, ge),
    d0 AS ({score.format(src="dentry")})"""
    ]
    visited = "dentry"
    frontier = "dentry"
    all_prev = "d0"
    for i in range(1, _HNSW_H1 + 1):
        descent.append(
            f"""dcand{i} AS (
      SELECT DISTINCT f.query_id, ed.dst AS node
      FROM {frontier} f JOIN l1edges ed ON ed.src = f.node
      WHERE NOT EXISTS (SELECT 1 FROM {visited} v
                        WHERE v.query_id = f.query_id AND v.node = ed.dst)
    ),
    ds{i} AS ({score.format(src=f"dcand{i}")}),
    dall{i} AS (
      SELECT * FROM {all_prev} UNION ALL SELECT * FROM ds{i}
    ),
    df{i} AS ({top1(f"dall{i}")}),
    dvis{i} AS (
      SELECT query_id, node FROM {visited}
      UNION SELECT query_id, node FROM dcand{i}
    )"""
        )
        visited = f"dvis{i}"
        frontier = f"df{i}"
        all_prev = f"dall{i}"
    descent_sql = ",\n    ".join(descent)
    hsearch = _nsw_duck_search(
        prefix="h",
        entry_sql=f"SELECT query_id, node FROM df{_HNSW_H1}",
    )
    sql = f"""
    WITH {_nsw_duck_base()},
    {_nsw_duck_search()},
    {descent_sql},
    {hsearch},
    {_ann_topk_cte("CROSS JOIN c", _NSW_K, "exact_k")},
    hall AS (
      SELECT DISTINCT query_id, node, cos FROM (
        SELECT * FROM {all_prev} UNION ALL SELECT * FROM hscored
      )
    ),
    hk AS (
      SELECT query_id, node AS vec_id FROM (
        SELECT query_id, node,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, node) AS rnk
        FROM hall
      ) WHERE rnk <= {_NSW_K}
    ),
    gk AS (
      SELECT query_id, node AS vec_id FROM (
        SELECT query_id, node,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, node) AS rnk
        FROM scored
      ) WHERE rnk <= {_NSW_K}
    ),
    hcount AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS hnsw_scored
      FROM hall GROUP BY query_id
    ),
    fcount AS (
      SELECT query_id, CAST(count(DISTINCT node) AS BIGINT) AS flat_scored
      FROM scored GROUP BY query_id
    ),
    hhits AS (
      SELECT e.query_id,
             CAST(count(*) AS BIGINT) AS n_exact,
             CAST(count(k.vec_id) AS BIGINT) AS hnsw_hits
      FROM exact_k e
      LEFT JOIN hk k ON k.query_id = e.query_id AND k.vec_id = e.vec_id
      GROUP BY e.query_id
    ),
    fhits AS (
      SELECT e.query_id, CAST(count(k.vec_id) AS BIGINT) AS flat_hits
      FROM exact_k e
      LEFT JOIN gk k ON k.query_id = e.query_id AND k.vec_id = e.vec_id
      GROUP BY e.query_id
    )
    SELECT hh.query_id, hh.n_exact,
           hc.hnsw_scored, fc.flat_scored,
           hh.hnsw_hits, fh.flat_hits,
           CAST(hh.hnsw_hits * 1000000 // hh.n_exact AS BIGINT)
             AS hnsw_recall_ppm,
           CAST(fh.flat_hits * 1000000 // hh.n_exact AS BIGINT)
             AS flat_recall_ppm
    FROM hhits hh
    JOIN fhits fh ON fh.query_id = hh.query_id
    JOIN hcount hc ON hc.query_id = hh.query_id
    JOIN fcount fc ON fc.query_id = hh.query_id
    """
    # Two full search chains + a descent share one construction: left
    # to DuckDB's default inlining, the multi-referenced CTEs expand
    # exponentially through the per-hop visited chains (>6 min at
    # sf0.01).  Materializing the shared frames — exactly what the
    # Spark side's localCheckpoints do — brings the oracle to <1 s.
    for name in (
        "\n    c AS (",
        "edges AS (",
        "l1edges AS (",
        "scored AS (",   # also rewrites hscored (substring match)
        f"df{_HNSW_H1} AS (",
        f"dall{_HNSW_H1} AS (",
        "hall AS (",
    ):
        repl = name.replace(" AS (", " AS MATERIALIZED (")
        sql = sql.replace(name, repl)
    return sql


@query(
    "embed_ann_hnsw",
    oracle=_hnsw_oracle(),
    tags=("llm", "similarity", "graph-ann", "hnsw", "evaluation"),
)
def embed_ann_hnsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW: the hierarchical entry layer over round 13's NSW graph,
    measured against the flat search at the same base-layer budget.
    Layer 1 is every ~8th corpus vector (md5-selected), wired into
    its own bucketed kNN + long-range small-world graph; search
    starts at the GLOBAL layer-1 entry (min vec_id), greedily
    descends {H1} hops with beam width 1 (next position = best
    cosine seen so far), and the descended node seeds the SAME
    base-layer beam search the flat index runs from a hash-seeded
    representative.  Per query the row reports both families' probe
    counts (distinct nodes scored, descent included) and recall@k
    against brute-force truth — the hierarchy buys a nearer start,
    visible as recall-per-probe.

    Every random draw in real HNSW (level assignment, entry point)
    is replaced by an md5 hash, so the oracle replays construction,
    descent, and search CTE-for-CTE; the brute-force truth CTE is
    the same one embed_ann_recall trusts.

    Scale: layer 1 is |corpus|/8 rows bucketed exactly like the base
    layer (linear construction, no all-pairs); descent probes are
    O(H1 * (M1+1)) per query; base search unchanged at
    O(HOPS*W*(M+1)) — all independent of corpus size."""
    from pyspark.sql import Window

    from downloader_spark.operators.llm_similarity import (
        _scored,
        N_QUERIES,
        topk_per_query,
    )
    from downloader_spark.operators.round13_ext import (
        _NSW_K,
        _nsw_build,
        _nsw_default_entry,
        _nsw_search,
    )

    from concurrent.futures import ThreadPoolExecutor

    # Base-layer EDGE construction is independent of the layer-1
    # construction + greedy descent (both need only the checkpointed
    # corpus frame), and the FLAT search chain is independent of the
    # hierarchical chain once edges exist — run each independent
    # checkpoint chain on its own driver thread (guide §2.6) so the
    # ~25 sequential tiny jobs overlap instead of queueing.  Results
    # are unchanged: checkpoint materialization order is invisible to
    # the plans that consume them (parity re-proven vs the oracle).
    parts = _nsw_build(spark, sf_dir, defer_edges=True)
    q, c, h, score = parts["q"], parts["c"], parts["h"], parts["score"]
    pair_cos = parts["pair_cos"]
    pool = ThreadPoolExecutor(max_workers=2)
    edges_lazy = parts.pop("edges_lazy")
    from concurrent.futures import Future

    f_edges: Future = Future()

    def _edges_then_flat():
        # The WHOLE flat-search chain (edge checkpoint -> entry
        # checkpoint -> per-hop beam checkpoints) depends only on the
        # checkpointed corpus, never on the layer-1/descent chain the
        # main thread runs — chaining it here overlaps its ~8
        # sequential tiny jobs with the hierarchy construction AND the
        # hierarchical beam search (guide §2.6).  The edge table is
        # published through its own future the moment it exists so the
        # main thread can seed the hierarchical search without waiting
        # for the flat chain to finish.
        try:
            edges = edges_lazy.localCheckpoint()
            f_edges.set_result(edges)
        except BaseException as e:  # noqa: BLE001 — unblock the main thread
            f_edges.set_exception(e)
            raise
        p2 = dict(parts)
        p2["edges"] = edges
        return _nsw_search(p2, _nsw_default_entry(p2)).localCheckpoint()

    f_flat = pool.submit(_edges_then_flat)

    # --- layer-1 construction (same recipe, its own hash tags) ---
    l1 = c.filter(
        F.expr(f"pmod({h('hns1', 'vec_id')}, {_HNSW_L1_MOD}) = 0")
    )
    n1 = l1.agg(
        F.count("*").alias("n1"),
        F.expr(
            f"greatest({_HNSW_NB1}, count(*) DIV {_HNSW_BSZ1})"
        ).alias("nb1"),
    )
    l1b = l1.crossJoin(F.broadcast(n1)).select(
        "vec_id",
        "embedding",
        "nrm",
        F.expr(f"pmod({h('hnsb1', 'vec_id')}, nb1)").alias("bkt"),
    )
    l1reps = l1b.groupBy("bkt").agg(F.min("vec_id").alias("rep"))
    u = l1b.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("s_emb"),
        F.col("nrm").alias("s_nrm"),
        "bkt",
    )
    v = l1b.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("d_emb"),
        F.col("nrm").alias("d_nrm"),
        "bkt",
    )
    near1 = (
        u.join(v, "bkt")
        .filter(F.col("src") != F.col("dst"))
        .withColumn("pcos", pair_cos("s_emb", "d_emb", "s_nrm", "d_nrm"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(
                    F.col("pcos").desc(), F.col("dst")
                )
            ),
        )
        .filter(F.col("rnk") <= _HNSW_M1)
        .select("src", "dst")
    )
    long1 = (
        l1.select(F.col("vec_id").alias("src"))
        .crossJoin(F.broadcast(n1))
        .select(
            "src", F.expr(f"pmod({h('hnsl1', 'src')}, nb1)").alias("tbkt")
        )
        .join(F.broadcast(l1reps), F.col("tbkt") == F.col("bkt"))
        .filter(F.col("rep") != F.col("src"))
        .select("src", F.col("rep").alias("dst"))
    )
    l1edges = near1.unionByName(long1).distinct().localCheckpoint()

    # --- greedy descent: global entry, beam width 1, H1 hops ---
    ge = (
        l1.agg(F.min("vec_id").alias("l1min"))
        .crossJoin(c.agg(F.min("vec_id").alias("cmin")))
        .select(F.coalesce("l1min", "cmin").alias("node"))
    )
    dentry = (
        q.select("query_id").crossJoin(F.broadcast(ge)).localCheckpoint()
    )
    visited = dentry
    frontier = dentry
    all_sc = score(dentry)
    for _i in range(_HNSW_H1):
        # cand is <= (M1+1) rows/query and every frame it references
        # (dentry, l1edges, the previous hop's checkpointed all_sc) is
        # already materialized, so its lineage is one join+distinct+
        # anti-join deep — recomputing it in the next hop's anti-join
        # is cheaper than its own eager checkpoint job (H1=2 hops, so
        # the chain never grows past two of these)
        cand = (
            frontier.join(l1edges, frontier.node == l1edges.src)
            .select("query_id", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["query_id", "node"], "left_anti")
        )
        all_sc = all_sc.unionByName(score(cand)).localCheckpoint()
        visited = visited.unionByName(cand)
        frontier = (
            all_sc.withColumn(
                "rnk",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("cos").desc(), F.col("node")
                    )
                ),
            )
            .filter(F.col("rnk") <= 1)
            .select("query_id", "node")
        )
    seed = frontier.localCheckpoint()

    # --- base-layer beam search from the descended seed; the flat
    # chain keeps running on the pool thread until the final union ---
    parts["edges"] = f_edges.result()
    hscored = _nsw_search(parts, seed)
    hall = all_sc.unionByName(hscored).distinct().localCheckpoint()
    flat = f_flat.result()
    pool.shutdown()

    def topk(df):
        return (
            df.withColumn(
                "rnk",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("cos").desc(), F.col("node")
                    )
                ),
            )
            .filter(F.col("rnk") <= _NSW_K)
            .select("query_id", F.col("node").alias("vec_id"))
        )

    emb = load_table(spark, sf_dir, "embeddings")
    exact_k = topk_per_query(
        _scored(
            emb.filter(F.col("vec_id") < N_QUERIES),
            emb.filter(F.col("vec_id") >= N_QUERIES),
        ),
        k=_NSW_K,
    ).select("query_id", "vec_id")

    hk = topk(hall).withColumnsRenamed({"query_id": "hq", "vec_id": "hv"})
    gk = topk(flat).withColumnsRenamed({"query_id": "gq", "vec_id": "gv"})
    hcount = hall.groupBy("query_id").agg(
        F.countDistinct("node").alias("hnsw_scored")
    )
    fcount = flat.groupBy("query_id").agg(
        F.countDistinct("node").alias("flat_scored")
    )
    hhits = (
        exact_k.join(
            hk,
            (exact_k.query_id == hk.hq) & (exact_k.vec_id == hk.hv),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hv").alias("hnsw_hits"),
        )
    )
    fhits = (
        exact_k.join(
            gk,
            (exact_k.query_id == gk.gq) & (exact_k.vec_id == gk.gv),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("gv").alias("flat_hits"))
    )
    return (
        hhits.join(fhits, "query_id")
        .join(hcount, "query_id")
        .join(fcount, "query_id")
        .select(
            "query_id",
            F.col("n_exact").cast("bigint"),
            F.col("hnsw_scored").cast("bigint"),
            F.col("flat_scored").cast("bigint"),
            F.col("hnsw_hits").cast("bigint"),
            F.col("flat_hits").cast("bigint"),
            F.expr("CAST(hnsw_hits * 1000000 DIV n_exact AS BIGINT)")
            .alias("hnsw_recall_ppm"),
            F.expr("CAST(flat_hits * 1000000 DIV n_exact AS BIGINT)")
            .alias("flat_recall_ppm"),
        )
    )
