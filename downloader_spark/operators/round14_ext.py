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


def _h40_py(payload: bytes) -> int:
    """40-bit md5 prefix — small enough that a per-file sum stays far
    inside BIGINT even at sf1 row counts (6M * 2^40 < 2^63)."""
    return int(hashlib.md5(payload).hexdigest()[:10], 16)


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
           CAST(sum({_h40_duck(val)}) AS BIGINT) AS value_hash_sum
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
    of a 40-bit md5 over every decoded value (ints rendered as
    decimal strings, strings hashed as their utf-8 bytes) must equal
    DuckDB's same sum over its OWN scan of the same file — one wrong
    snappy copy offset, one mis-decoded RLE run, one off-by-one in a
    byte-array length and the sums diverge.  Covers INT32/INT64/
    BYTE_ARRAY, dictionary and PLAIN pages, 5-row to largest-fact
    files.

    At 100 TB this layer IS the scan: engines that cannot decode
    pages cannot prune, vectorize, or verify a lake.  Shape: one
    binaryFile row per table into a map-only Arrow stage
    (repartitioned so each file decodes in parallel); the exchange
    carries only file bytes, the output is 12 tiny rows."""
    import os

    from downloader_spark.media import read_parquet_column

    tables = sorted({t for t, _c, _k in _PQ_PAGE_COLS})
    cols_by_table: dict[str, list[tuple[str, str]]] = {}
    for t, c, k in _PQ_PAGE_COLS:
        cols_by_table.setdefault(t, []).append((c, k))
    paths = [os.path.join(sf_dir, f"{t}.parquet") for t in tables]
    files = (
        spark.read.format("binaryFile")
        .load(paths)
        .select("path", "content")
        .repartition(len(paths))
    )

    def run(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = path.rsplit("/", 1)[-1].removesuffix(".parquet")
                data = bytes(content)
                for col, kind in cols_by_table[name]:
                    values = read_parquet_column(data, col)
                    hsum = 0
                    nulls = 0
                    for v in values:
                        if v is None:
                            nulls += 1
                        elif kind == "int":
                            hsum += _h40_py(str(v).encode())
                        else:
                            hsum += _h40_py(v)
                    out.append((name, col, len(values), nulls, hsum))
            yield pd.DataFrame(
                out,
                columns=["tbl", "col", "n_rows", "null_count", "value_hash_sum"],
            )

    return files.mapInPandas(
        run,
        "tbl string, col string, n_rows long, null_count long,"
        " value_hash_sum long",
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
        cs = m.group(1).lower()
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
    sees bytes, a BOM, or a decoder."""
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
                page = _synth_page_text(case, str(text))
                raw = _encode_page(case, page)
                cs, method, decoded = sniff_charset(raw)
                assert decoded == page  # transcode must be lossless
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
