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
