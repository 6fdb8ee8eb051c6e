"""Round-trip tests for the non-parquet loaders (csv/json/text)."""

from __future__ import annotations

from downloader_spark.io import load_csv, load_json, load_table, load_text
from tests.conftest import SF_DIR


def test_csv_roundtrip_with_explicit_schema(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation")
    out = str(tmp_path / "nation_csv")
    nation.coalesce(1).write.option("header", "true").csv(out)
    back = load_csv(
        spark, out, schema="n_nationkey long, n_name string, n_regionkey long"
    )
    assert back.count() == nation.count()
    assert {f.name for f in back.schema.fields} >= {"n_nationkey", "n_name"}
    got = {r.n_nationkey: r.n_name for r in back.collect()}
    want = {r.n_nationkey: r.n_name for r in nation.collect()}
    assert got == want


def test_json_roundtrip(spark, tmp_path):
    region = load_table(spark, SF_DIR, "region")
    out = str(tmp_path / "region_json")
    region.coalesce(1).write.json(out)
    back = load_json(spark, out, schema="r_regionkey long, r_name string")
    assert {r.r_name for r in back.collect()} == {
        r.r_name for r in region.collect()
    }


def test_text_scan_line_shape(spark, tmp_path):
    p = tmp_path / "log.txt"
    p.write_text("# comment\n123 4567890123 some/path\n")
    df = load_text(spark, str(p))
    assert [f.name for f in df.schema.fields] == ["value"]
    assert df.count() == 2


def test_json_corrupt_records_are_captured_not_fatal(spark, tmp_path):
    """PERMISSIVE schema-on-read: malformed lines land in the corrupt
    column instead of failing the scan — at 100 TB a handful of bad
    records must never kill the job."""
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\nNOT-JSON\n{"a": }\n')
    df = load_json(
        spark,
        str(p),
        schema="a long, _corrupt string",
        columnNameOfCorruptRecord="_corrupt",
    )
    rows = df.collect()
    good = [r.a for r in rows if r.a is not None]
    bad = [r._corrupt for r in rows if r._corrupt is not None]
    assert sorted(good) == [1, 2]
    assert len(bad) == 2


def test_orc_round_trip_preserves_values_and_pushes_filters(spark, tmp_path):
    """ORC interop: write lineitem slice as ORC, read it back
    value-identical, and confirm the scan gets the same predicate
    pushdown + column pruning contract the parquet paths rely on."""
    from downloader_spark.io import load_orc, load_table
    from downloader_spark.sinks import write_orc

    src = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate", "l_returnflag"
    )
    path = str(tmp_path / "li_orc")
    write_orc(src, path)

    back = load_orc(spark, path)
    assert back.count() == src.count()
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0

    filtered = back.filter(back.l_quantity > 30).select("l_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_returnflag" not in read_schema, (
        "pruning must reach the ORC scan"
    )


def test_page_reader_decodes_spark_written_parquet(spark, tmp_path):
    """Our from-scratch page reader against parquet-java (Spark's
    writer) — a second, independent writer implementation with its
    own page layouts, PLAIN_DICTIONARY encoding ids, and codec
    framing.  Every value of every flat column must match what Spark
    itself wrote, for snappy, gzip, zstd and uncompressed files."""
    import glob

    from pyspark.sql import functions as F

    from downloader_spark.io import load_table
    from downloader_spark.media import read_parquet_columns

    src = load_table(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "o_flag", F.expr("o_orderkey % 3 = 0")
    ).withColumn(
        "o_null", F.expr("CASE WHEN o_orderkey % 5 = 0 THEN NULL"
                         " ELSE o_orderkey * 7 END")
    )
    want = {
        r["o_orderkey"]: r
        for r in src.collect()
    }
    cols = ["o_orderkey", "o_orderpriority", "o_flag", "o_null"]
    for codec in ("snappy", "gzip", "zstd", "uncompressed"):
        out = str(tmp_path / f"pj_{codec}")
        src.coalesce(2).write.option("compression", codec).parquet(out)
        got = {}
        for part in glob.glob(f"{out}/*.parquet"):
            data = open(part, "rb").read()
            vals = read_parquet_columns(data, cols)
            for k, prio, flag, nul in zip(
                vals["o_orderkey"], vals["o_orderpriority"],
                vals["o_flag"], vals["o_null"],
            ):
                got[k] = (prio.decode(), flag, nul)
        assert len(got) == len(want), codec
        for k, r in want.items():
            assert got[k] == (
                r["o_orderpriority"], r["o_flag"], r["o_null"]
            ), (codec, k)
