"""Round-15 keys: nested (LIST) parquet pages decoded from scratch,
and a minimal table-format snapshot read over the engine's own
footer/pages layers.

Extends the round-14 DATA-page reader below flat columns: repetition
levels are parsed from every page (V1 4-byte-prefixed RLE, V2
header-length RLE) and Dremel-reassembled into per-row lists — see
media.read_parquet_list_column.  (Reference lineage: the fetched
archives are opaque byte streams at
/root/reference/download/common.go:106; decoding them is the
downstream consumer this engine adds.)  Registry contract as
everywhere: a Spark-first plan plus an independently-constructed
DuckDB oracle, never the same SQL twice.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd  # noqa: F401 — resolves stringified UDF type hints

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.plans.registry import query

_H40_MOD = 1 << 40
_FSCALE = 1073741824.0  # 2^30: float32 -> double widening keeps floor exact


def _h40(payload: bytes) -> int:
    return int(hashlib.md5(payload).hexdigest()[:10], 16)


# ------------------------------------------------------------------
# multimodal_parquet_nested — LIST columns straight off the bytes
# ------------------------------------------------------------------
#
# Two evidence sources, one differential shape:
#
# 1. The REAL embeddings fixture (list<float>): per-file partials from
#    media.read_parquet_list_column vs DuckDB's own scan.  Floats are
#    compared through floor(value * 2^30) — float32 -> double widening
#    is exact on both sides, so the sum is bit-deterministic while a
#    single mis-decoded BYTE_STREAM_SPLIT/PLAIN byte diverges it.
# 2. A synthesized nested corpus (list<int64> + list<string> with null
#    lists, empty lists, and null elements) written by pyarrow INSIDE
#    the Arrow stage with a per-shard writer-config matrix
#    (snappy/zstd/gzip/none x data-page v1/v2 x dict/plain, multiple
#    row groups), read back by OUR decoder, 40-bit-md5 value hashes
#    vs the oracle's closed-form regeneration of the same corpus.

_NROWS_SYN = 240
_NSHARDS = 4
_ROWS_PER_SHARD = _NROWS_SYN // _NSHARDS


def _syn_int_row(i: int):
    if i % 11 == 5:
        return None
    if i % 7 == 3:
        return []
    return [
        None if (i + j) % 13 == 0 else (i * 1009 + j * 7919) % 100003 - 50001
        for j in range(i % 5 + 1)
    ]


def _syn_str_row(i: int):
    if i % 9 == 4:
        return None
    if i % 6 == 2:
        return []
    return [
        None if (i + 2 * j) % 17 == 3 else f"s-{(i * 37 + j * 101) % 9973}"
        for j in range(i % 4 + 1)
    ]


def _list_partial(col: str, rows: list, hash_one) -> tuple:
    n_rows = len(rows)
    null_lists = sum(1 for r in rows if r is None)
    empty_lists = sum(1 for r in rows if r is not None and len(r) == 0)
    n_elements = 0
    null_elements = 0
    hsum = 0
    for r in rows:
        if r is None:
            continue
        n_elements += len(r)
        for v in r:
            if v is None:
                null_elements += 1
            else:
                hsum += hash_one(v)
    return (
        col, n_rows, null_lists, empty_lists, n_elements, null_elements,
        hsum % _H40_MOD,
    )


def _nested_oracle() -> str:
    h40 = "CAST(concat('0x', substring(md5({e}), 1, 10)) AS BIGINT)"
    m = _H40_MOD
    return f"""
WITH emb_rows AS (
    SELECT 'embedding' AS col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_lists,
           CAST(sum(CASE WHEN embedding IS NOT NULL
                          AND len(embedding) = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS empty_lists
    FROM embeddings
),
emb_elems AS (
    SELECT CAST(count(*) AS BIGINT) AS n_elements,
           CAST(sum(CASE WHEN u.e IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_elements,
           CAST(((sum(CAST(floor(CAST(u.e AS DOUBLE) * {_FSCALE})
                           AS BIGINT)) % {m}) + {m}) % {m}
                AS BIGINT) AS value_hash_sum
    FROM embeddings, unnest(embedding) AS u(e)
),
ri AS (SELECT CAST(i AS BIGINT) AS i FROM generate_series(0, {_NROWS_SYN - 1}) t(i)),
int_kind AS (
    SELECT i, CASE WHEN i % 11 = 5 THEN 0
                   WHEN i % 7 = 3 THEN 1 ELSE 2 END AS kind
    FROM ri
),
int_elems AS (
    SELECT r.i, s.j,
           CASE WHEN (r.i + s.j) % 13 = 0 THEN NULL
                ELSE (r.i * 1009 + s.j * 7919) % 100003 - 50001 END AS v
    FROM int_kind r
    JOIN (SELECT CAST(j AS BIGINT) AS j
          FROM generate_series(0, 4) g(j)) s ON s.j <= r.i % 5
    WHERE r.kind = 2
),
ints AS (
    SELECT 'ints' AS col,
           (SELECT CAST(count(*) AS BIGINT) FROM int_kind) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM int_kind
             WHERE kind = 0) AS null_lists,
           (SELECT CAST(count(*) AS BIGINT) FROM int_kind
             WHERE kind = 1) AS empty_lists,
           CAST(count(*) AS BIGINT) AS n_elements,
           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_elements,
           CAST(sum(CASE WHEN v IS NULL THEN 0
                    ELSE {h40.format(e='CAST(v AS VARCHAR)')} END) % {m}
                AS BIGINT) AS value_hash_sum
    FROM int_elems
),
str_kind AS (
    SELECT i, CASE WHEN i % 9 = 4 THEN 0
                   WHEN i % 6 = 2 THEN 1 ELSE 2 END AS kind
    FROM ri
),
str_elems AS (
    SELECT r.i, s.j,
           CASE WHEN (r.i + 2 * s.j) % 17 = 3 THEN NULL
                ELSE concat('s-', CAST((r.i * 37 + s.j * 101) % 9973
                                       AS VARCHAR)) END AS v
    FROM str_kind r
    JOIN (SELECT CAST(j AS BIGINT) AS j
          FROM generate_series(0, 3) g(j)) s ON s.j <= r.i % 4
    WHERE r.kind = 2
),
strs AS (
    SELECT 'strs' AS col,
           (SELECT CAST(count(*) AS BIGINT) FROM str_kind) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM str_kind
             WHERE kind = 0) AS null_lists,
           (SELECT CAST(count(*) AS BIGINT) FROM str_kind
             WHERE kind = 1) AS empty_lists,
           CAST(count(*) AS BIGINT) AS n_elements,
           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_elements,
           CAST(sum(CASE WHEN v IS NULL THEN 0
                    ELSE {h40.format(e='v')} END) % {m}
                AS BIGINT) AS value_hash_sum
    FROM str_elems
)
SELECT e.col, e.n_rows, e.null_lists, e.empty_lists,
       x.n_elements, x.null_elements, x.value_hash_sum
FROM emb_rows e CROSS JOIN emb_elems x
UNION ALL SELECT * FROM ints
UNION ALL SELECT * FROM strs
"""


_NESTED_SCHEMA = (
    "col string, n_rows long, null_lists long, empty_lists long,"
    " n_elements long, null_elements long, value_hash_sum long"
)
_NESTED_COLS = [
    "col", "n_rows", "null_lists", "empty_lists", "n_elements",
    "null_elements", "value_hash_sum",
]


@query(
    "multimodal_parquet_nested",
    oracle=_nested_oracle(),
    tags=("multimodal", "parquet", "nested", "list", "mapInPandas"),
)
def multimodal_parquet_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested LIST parquet pages decoded from scratch — the layer the
    round-14 flat-page key stopped short of: repetition levels (V1
    length-prefixed RLE, V2 header-sized RLE) + definition levels are
    Dremel-reassembled into per-row lists by
    media.read_parquet_list_column, distinguishing null list / empty
    list / null element / value with the rep_def boundary from the
    schema walk.

    Differential, two independent sources: (1) the REAL embeddings
    fixture (list<float>, 3-level pyarrow layout) — counts plus an
    exact floor(value*2^30) sum (float32->double widening is exact on
    both sides) against DuckDB's own scan; (2) a synthesized
    list<int64> + list<string> corpus with null lists, empty lists and
    null elements, written by pyarrow inside the Arrow stage under a
    per-shard writer matrix (snappy/zstd/gzip/uncompressed, data-page
    v1/v2, dictionary and plain, 4 row groups per shard) so every
    decoder path sees repetition levels, verified value-for-value in
    the stage and 40-bit-md5-hash-summed against the oracle's
    closed-form regeneration.

    At 100 TB every embedding/token-list column IS this shape; an
    engine that cannot walk repetition levels cannot audit its own
    lake.  Map-only per-file/per-shard partials into one map-side-
    combinable merge — no payload shuffle."""
    import os

    from downloader_spark.media import read_parquet_list_column

    n = spark.sparkContext.defaultParallelism
    emb_files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(os.path.join(sf_dir, "embeddings.parquet"))
        .select("content")
        .repartition(n)
    )

    def run_emb(batches):
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                rows = read_parquet_list_column(bytes(content), "embedding")
                out.append(
                    _list_partial(
                        "embedding", rows,
                        lambda v: math.floor(v * _FSCALE) % _H40_MOD,
                    )
                )
            yield pd.DataFrame(out, columns=_NESTED_COLS)

    emb_partials = emb_files.mapInPandas(run_emb, _NESTED_SCHEMA)

    shards = spark.range(0, _NSHARDS, 1, _NSHARDS)

    def run_syn(batches):
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq_mod

        writer_matrix = [
            dict(compression="snappy", data_page_version="1.0"),
            dict(compression="zstd", data_page_version="2.0"),
            dict(
                compression="gzip",
                data_page_version="1.0",
                use_dictionary=False,
            ),
            dict(
                compression="none",
                data_page_version="2.0",
                use_dictionary=False,
            ),
        ]
        for pdf in batches:
            out = []
            for s in pdf["id"]:
                s = int(s)
                lo = s * _ROWS_PER_SHARD
                idx = range(lo, lo + _ROWS_PER_SHARD)
                ints = [_syn_int_row(i) for i in idx]
                strs = [_syn_str_row(i) for i in idx]
                tbl = pa.table(
                    {
                        "ints": pa.array(ints, pa.list_(pa.int64())),
                        "strs": pa.array(strs, pa.list_(pa.string())),
                    }
                )
                buf = io.BytesIO()
                pq_mod.write_table(
                    tbl, buf, row_group_size=16, **writer_matrix[s % 4]
                )
                data = buf.getvalue()
                got_i = read_parquet_list_column(data, "ints")
                got_s = read_parquet_list_column(data, "strs")
                want_s = [
                    None
                    if r is None
                    else [x if x is None else x.encode() for x in r]
                    for r in strs
                ]
                if got_i != ints or got_s != want_s:
                    raise ValueError(
                        f"nested decode mismatch in shard {s} "
                        f"({writer_matrix[s % 4]})"
                    )
                out.append(
                    _list_partial(
                        "ints", got_i,
                        lambda v: _h40(str(v).encode()),
                    )
                )
                out.append(_list_partial("strs", got_s, _h40))
            yield pd.DataFrame(out, columns=_NESTED_COLS)

    syn_partials = shards.mapInPandas(run_syn, _NESTED_SCHEMA)

    partials = emb_partials.unionByName(syn_partials)
    # per-partial sums are < 2^40; the merge stays in BIGINT up to
    # ~8M part files, and the final pmod matches the oracle's
    return partials.groupBy("col").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("null_lists").alias("null_lists"),
        F.sum("empty_lists").alias("empty_lists"),
        F.sum("n_elements").alias("n_elements"),
        F.sum("null_elements").alias("null_elements"),
        F.expr(
            f"CAST(pmod(sum(value_hash_sum), {_H40_MOD}) AS BIGINT)"
        ).alias("value_hash_sum"),
    )


# ------------------------------------------------------------------
# table_snapshot_read — Delta-style action log + own-writer scan
# ------------------------------------------------------------------
#
# A four-commit JSON action log (add/remove/commitInfo, one JSON-lines
# blob per version — the public Delta PROTOCOL.md shape) over five
# parquet part files.  Every snapshot 0..3 is resolved by folding the
# log (downloader_spark/tablelog.py), then scanned with the engine's
# OWN from-scratch parquet writer + page reader: each part's bytes are
# regenerated deterministically from its id under a writer-config
# matrix (snappy/gzip/none x dictionary/plain x single/multi row
# group), so the encode->decode twins sit in the query path itself.

_TBL_PARTS: dict[str, tuple[int, int, int, dict]] = {
    # path -> (lo_id, hi_id_excl, value_offset, writer kwargs)
    "part-0.parquet": (0, 50, 0, dict(use_dictionary=True)),
    "part-1.parquet": (50, 100, 0, dict(compression="gzip")),
    "part-2.parquet": (100, 150, 0, dict(row_group_size=17)),
    "part-3.parquet": (
        50, 100, 1000,
        dict(compression="gzip", use_dictionary=True, row_group_size=13),
    ),
    "part-4.parquet": (
        150, 200, 0,
        dict(compression="none", use_dictionary=True),
    ),
}

_TBL_LOG_FILES: dict[int, str] = {
    0: (
        '{"commitInfo": {"operation": "WRITE"}}\n'
        '{"add": {"path": "part-0.parquet", "size": 50}}\n'
        '{"add": {"path": "part-1.parquet", "size": 50}}\n'
    ),
    1: (
        '{"commitInfo": {"operation": "APPEND"}}\n'
        '{"add": {"path": "part-2.parquet", "size": 50}}\n'
    ),
    2: (
        '{"commitInfo": {"operation": "UPDATE"}}\n'
        '{"remove": {"path": "part-1.parquet"}}\n'
        '{"add": {"path": "part-3.parquet", "size": 50}}\n'
    ),
    3: (
        '{"commitInfo": {"operation": "APPEND"}}\n'
        '{"add": {"path": "part-4.parquet", "size": 50}}\n'
    ),
}


def _tbl_value(i: int, offset: int) -> int:
    return (i * 7919) % 1000003 + offset


def _tbl_part_bytes(path: str) -> bytes:
    from downloader_spark.media import encode_parquet

    lo, hi, off, kw = _TBL_PARTS[path]
    return encode_parquet(
        {
            "k": list(range(lo, hi)),
            "val": [_tbl_value(i, off) for i in range(lo, hi)],
        },
        **kw,
    )


def _snapshot_oracle() -> str:
    h40 = "CAST(concat('0x', substring(md5({e}), 1, 10)) AS BIGINT)"
    m = _H40_MOD
    return f"""
WITH vers AS (SELECT CAST(v AS BIGINT) AS v FROM generate_series(0, 3) t(v)),
ids AS (SELECT CAST(i AS BIGINT) AS i FROM generate_series(0, 199) t(i)),
vis AS (
    SELECT v.v, i.i,
           CASE WHEN v.v >= 2 AND i.i BETWEEN 50 AND 99
                THEN 1000 ELSE 0 END AS off
    FROM vers v JOIN ids i
      ON i.i < 100 OR (v.v >= 1 AND i.i < 150) OR v.v >= 3
)
SELECT v AS version,
       CAST(CASE v WHEN 0 THEN 2 WHEN 1 THEN 3 WHEN 2 THEN 3
                   ELSE 4 END AS BIGINT) AS n_files,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(i) AS BIGINT) AS sum_k,
       CAST(sum({h40.format(e="CAST((i * 7919) % 1000003 + off AS VARCHAR)")})
            % {m} AS BIGINT) AS value_hash_sum
FROM vis
GROUP BY v
"""


@query(
    "table_snapshot_read",
    oracle=_snapshot_oracle(),
    tags=("table-format", "snapshot", "time-travel", "parquet", "log"),
)
def table_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal table-format snapshot read: a Delta-style JSON action
    log (add / remove / commitInfo; one JSON-lines commit per version)
    is folded into each version's visible file set by
    tablelog.visible_files — metadata-only driver work, exactly how
    Delta/Iceberg clients resolve snapshots — and every snapshot 0..3
    is then scanned through the engine's OWN layers: part bytes come
    from the from-scratch parquet WRITER (dictionary pages, gzip
    bodies via the from-scratch DEFLATE encoder, multi-row-group) and
    are decoded by the from-scratch page READER, per (version, file)
    task.

    Version 2 is an UPDATE commit (remove part-1, add part-3 with the
    same keys shifted +1000), so time travel is observable: the same
    key range hashes differently across versions while sum_k is
    invariant — the differential DuckDB recomputes closed-form from
    the planted log semantics.

    At 100 TB the log fold stays KB-sized metadata; scans fan out one
    task per visible file with per-file partials merged by one
    map-side-combinable aggregation, and old snapshots stay readable
    because remove actions tombstone rather than delete — the
    canonical lakehouse read path."""
    from downloader_spark.media import read_parquet_columns
    from downloader_spark.tablelog import parse_log, snapshot_history

    log = parse_log(_TBL_LOG_FILES)
    history = snapshot_history(log)
    pairs = [
        (v, path) for v, paths in history.items() for path in paths
    ]
    n = spark.sparkContext.defaultParallelism
    work = spark.createDataFrame(
        pairs, "version long, path string"
    ).repartition(n)

    def run(batches):
        for pdf in batches:
            out = []
            for v, path in zip(pdf["version"], pdf["path"]):
                data = _tbl_part_bytes(path)
                cols = read_parquet_columns(data, ["k", "val"])
                hsum = sum(
                    _h40(str(x).encode()) for x in cols["val"]
                ) % _H40_MOD
                out.append(
                    (int(v), 1, len(cols["k"]), sum(cols["k"]), hsum)
                )
            yield pd.DataFrame(
                out,
                columns=["version", "n_files", "n_rows", "sum_k",
                         "value_hash_sum"],
            )

    partials = work.mapInPandas(
        run,
        "version long, n_files long, n_rows long, sum_k long,"
        " value_hash_sum long",
    )
    return partials.groupBy("version").agg(
        F.sum("n_files").alias("n_files"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_k").alias("sum_k"),
        F.expr(
            f"CAST(pmod(sum(value_hash_sum), {_H40_MOD}) AS BIGINT)"
        ).alias("value_hash_sum"),
    )


# ------------------------------------------------------------------
# multimodal_h264_ipcm — H.264 container layer through real bytes
# ------------------------------------------------------------------

_H264_W = 32
_H264_H = 16
_H264_FRAMES = 4

# closed-form plane synthesis shared with the oracle
_H264_Y = "(doc_id * 7 + {f} * 31 + {y} * 17 + {x} * 3) % 256"
_H264_CB = "(doc_id * 5 + {f} * 13 + {y} * 11 + {x} * 7) % 256"
_H264_CR = "(doc_id * 3 + {f} * 19 + {y} * 23 + {x} * 29) % 256"


def _h264_oracle() -> str:
    return f"""
WITH grid_y AS (
    SELECT doc_id, CAST(f AS BIGINT) AS f,
           CAST(sum({_H264_Y.format(f="f", y="y", x="x")}) AS BIGINT)
             AS luma_sum
    FROM documents,
         unnest(generate_series(0, {_H264_FRAMES - 1})) AS u(f),
         unnest(generate_series(0, {_H264_H - 1})) AS v(y),
         unnest(generate_series(0, {_H264_W - 1})) AS w(x)
    GROUP BY doc_id, f
),
grid_c AS (
    SELECT doc_id, CAST(f AS BIGINT) AS f,
           CAST(sum({_H264_CB.format(f="f", y="y", x="x")}) AS BIGINT)
             AS cb_sum,
           CAST(sum({_H264_CR.format(f="f", y="y", x="x")}) AS BIGINT)
             AS cr_sum
    FROM documents,
         unnest(generate_series(0, {_H264_FRAMES - 1})) AS u(f),
         unnest(generate_series(0, {_H264_H // 2 - 1})) AS v(y),
         unnest(generate_series(0, {_H264_W // 2 - 1})) AS w(x)
    GROUP BY doc_id, f
)
SELECT y.doc_id, y.f AS frame_no,
       CAST({_H264_H} * {_H264_W} AS BIGINT) AS n_pixels,
       y.luma_sum, c.cb_sum, c.cr_sum
FROM grid_y y JOIN grid_c c ON y.doc_id = c.doc_id AND y.f = c.f
"""


@query(
    "multimodal_h264_ipcm",
    oracle=_h264_oracle(),
    tags=("multimodal", "video", "h264", "mapInPandas"),
)
def multimodal_h264_ipcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H.264 CONTAINER layer through real bytes (closing the SURVEY
    H.264 row): each doc's deterministic 4-frame 4:2:0 clip is encoded
    to a genuine Annex-B baseline H.264 stream of I_PCM IDR pictures —
    4-byte start codes, NAL headers, RBSP emulation prevention (the
    zero-heavy planes force real 00 00 03 escapes), Exp-Golomb
    SPS/PPS/slice headers, byte-aligned raw macroblock samples per
    ITU-T H.264 Table 7-11 — and DECODED back inside the Arrow stage
    (downloader_spark/h264.py), emitting exact per-frame luma AND
    chroma sums.  I_PCM is the spec's lossless escape hatch, so the
    oracle recomputes every sum closed-form from the plane synthesis
    and never sees a byte; the predicted/CAVLC macroblock path is
    explicitly descoped (no external H.264 truth exists in this
    container to validate entropy tables against) and raises loudly.

    Shape: map-only Arrow stage over the repartitioned key column; at
    100 TB the synthesis select becomes a binaryFile scan per clip."""
    import numpy as np

    from downloader_spark.h264 import decode_h264_ipcm, encode_h264_ipcm
    from downloader_spark.io import load_table

    n = spark.sparkContext.defaultParallelism
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(n)
    )
    w, h, nf = _H264_W, _H264_H, _H264_FRAMES

    def run(batches):
        fy, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
        fc, yc, xc = np.mgrid[0:nf, 0 : h // 2, 0 : w // 2]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                luma = ((d * 7 + fy * 31 + yy * 17 + xx * 3) % 256).astype(
                    np.uint8
                )
                cb = ((d * 5 + fc * 13 + yc * 11 + xc * 7) % 256).astype(
                    np.uint8
                )
                cr = ((d * 3 + fc * 19 + yc * 23 + xc * 29) % 256).astype(
                    np.uint8
                )
                gy, gb, gr = decode_h264_ipcm(
                    encode_h264_ipcm(luma, cb, cr)
                )
                if not (
                    np.array_equal(gy, luma)
                    and np.array_equal(gb, cb)
                    and np.array_equal(gr, cr)
                ):
                    raise ValueError(f"h264 I_PCM mismatch for doc {d}")
                for f in range(nf):
                    out.append(
                        (
                            d, f, h * w,
                            int(gy[f].astype(np.int64).sum()),
                            int(gb[f].astype(np.int64).sum()),
                            int(gr[f].astype(np.int64).sum()),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "frame_no", "n_pixels", "luma_sum",
                    "cb_sum", "cr_sum",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, frame_no long, n_pixels long, luma_sum long,"
        " cb_sum long, cr_sum long",
    )
