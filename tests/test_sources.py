"""Sources/sinks — SURVEY §2.1: text K/V round trip, scan filters,
partitioned writes with pruning, multi-sink shared scan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from quatrain_mapreduce_spark.catalog import load_table
from quatrain_mapreduce_spark.sources.readers import (
    filtered_scan, multiple_inputs, read_kv_text, read_text,
)
from quatrain_mapreduce_spark.sources.sinks import multi_sink, write_kv_text, write_parquet


def test_kv_text_round_trip(spark, tmp_path):
    """TextOutputFormat K\\tV write → KeyValueTextInputFormat read."""
    df = spark.createDataFrame([(1, "alpha"), (2, "beta\twith tab")], "k int, v string")
    path = str(tmp_path / "kv")
    write_kv_text(df, "k", "v", path)
    back = read_kv_text(spark, path)
    got = {r["key"]: r["value"] for r in back.collect()}
    # KeyValueTextInputFormat: split on FIRST separator — embedded tabs stay in value
    assert got == {"1": "alpha", "2": "beta\twith tab"}


def test_read_text_line_records(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("line one\nline two\n")
    assert read_text(spark, str(p)).count() == 2


def test_filtered_scan_variants(spark):
    df = spark.createDataFrame([(i, f"row{i}") for i in range(20)], "key int, val string")
    assert filtered_scan(df, "val", regex="row1$").count() == 1
    assert filtered_scan(df, "key", frequency=5).count() == 4  # 0,5,10,15
    md5_rows = filtered_scan(df, "key", md5_frequency=3).collect()
    assert all(hash is not None for hash in md5_rows)  # deterministic subset, no error


def test_multiple_inputs_union(spark):
    a = spark.createDataFrame([(1, "a")], "k int, v string")
    b = spark.createDataFrame([(2,)], "k int")
    got = multiple_inputs([a, b]).collect()
    assert {(r["k"], r["v"]) for r in got} == {(1, "a"), (2, None)}


def test_partitioned_write_prunes_scan(spark, tmp_path):
    """partitionBy write + partition-column predicate → pruned file listing
    (PartitionPruner.java:238 parity)."""
    df = spark.createDataFrame([(i, "even" if i % 2 == 0 else "odd") for i in range(100)],
                               "v int, part string")
    path = str(tmp_path / "part")
    write_parquet(df, path, partition_by=["part"])
    assert {"part=even", "part=odd"} <= set(os.listdir(path))
    back = spark.read.parquet(path).where(F.col("part") == "even")
    assert back.count() == 50
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan


def test_multi_sink_shared_scan(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    multi_sink(df, [
        lambda d: d.where(F.col("v") < 5).write.mode("overwrite").parquet(p1),
        lambda d: d.where(F.col("v") >= 5).write.mode("overwrite").parquet(p2),
    ])
    assert spark.read.parquet(p1).count() == 5
    assert spark.read.parquet(p2).count() == 5


def test_multi_format_sink_demuxes_one_scan_two_formats(spark, tmp_path):
    """MultipleOutputFormat heterogeneous demux: one shared scan routed to a
    parquet sink AND a csv sink by key predicate; the branch plans read the
    persisted shared subplan (InMemoryTableScan), not the source — one scan."""
    from quatrain_mapreduce_spark.sources.sinks import multi_format_sink

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "hot" if i % 3 == 0 else "cold") for i in range(90)], "v int, k string"
    ).write.parquet(src)
    df = spark.read.parquet(src)
    pq, csv = str(tmp_path / "route_pq"), str(tmp_path / "route_csv")
    multi_format_sink(df, [
        (F.col("k") == "hot", "parquet", pq, None),
        (F.col("k") == "cold", "csv", csv, {"header": "true"}),
    ])
    # each route materialized in its own format with its key subset
    assert spark.read.parquet(pq).count() == 30
    back = spark.read.option("header", True).csv(csv)
    assert back.count() == 60
    assert set(back.columns) == {"v", "k"}
    # one-scan property: while the shared frame is persisted, a route branch
    # compiles to an InMemoryTableScan (cache read), not a second FileScan
    df.persist()
    try:
        df.count()
        plan = df.where(F.col("k") == "hot")._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        df.unpersist()


def test_bucketed_join_has_no_exchange(spark):
    """Bucketed tables joined on the bucket key must plan WITHOUT a shuffle
    on either side (MapFileOutputFormat / CLUSTERED BY parity — the whole
    point of bucketing at 100 TB)."""
    from quatrain_mapreduce_spark.plans.sources_queries import bucketed_join

    out = bucketed_join(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    # no Exchange between the scans and the join (bucket-aligned reads)
    scan_section = plan[plan.index("Join"):]
    assert "Exchange hashpartitioning" not in scan_section


def test_clock_stream_ticks(spark):
    """ClockInputFormat / RealTimeRecordReader parity: the rate source emits
    (sequence, now) ticks."""
    from quatrain_mapreduce_spark.streaming.hop import clock_stream

    ticks = clock_stream(spark, rows_per_second=100)
    assert ticks.isStreaming and set(ticks.columns) == {"sequence", "now"}
    q = (ticks.writeStream.format("memory").queryName("qms_test_clock")
         .outputMode("append").start())
    import time
    time.sleep(3)
    q.stop()
    n = spark.table("qms_test_clock").count()
    assert n > 0


def test_load_data_adopts_files(spark, tmp_path):
    """LOAD DATA INPATH parity: external files become part of a catalog
    table; the table sees the union after adoption."""
    from quatrain_mapreduce_spark.sources.sinks import load_data

    spark.sql("DROP TABLE IF EXISTS qms_test_load")
    import shutil
    from urllib.parse import urlparse
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/qms_test_load", ignore_errors=True)

    base = spark.createDataFrame([(1, "a")], "k int, v string")
    base.write.saveAsTable("qms_test_load")
    extra_path = str(tmp_path / "incoming")
    spark.createDataFrame([(2, "b"), (3, "c")], "k int, v string").write.parquet(extra_path)

    load_data(spark, extra_path, "qms_test_load")
    got = {r["k"]: r["v"] for r in spark.table("qms_test_load").collect()}
    assert got == {1: "a", 2: "b", 3: "c"}


def test_read_xml_records_multiline_and_attrs(spark, tmp_path):
    """Records spanning lines, attributes on the row tag, junk outside
    records (StreamXmlRecordReader semantics: only tag-bounded content)."""
    from quatrain_mapreduce_spark.sources.readers import read_xml_records, xml_field

    p = tmp_path / "recs.xml"
    p.write_text(
        "<doc>\n"
        "<row id=\"1\">\n  <k>alpha</k>\n  <v>line1\nline2</v>\n</row>\n"
        "junk between records\n"
        "<row>\n  <k>beta</k>\n  <v>x</v>\n</row>\n"
        "</doc>\n"
    )
    recs = read_xml_records(spark, str(p), "row")
    rows = recs.select(
        xml_field("record", "k").alias("k"), xml_field("record", "v").alias("v")
    ).collect()
    got = {(r["k"], r["v"]) for r in rows}
    assert got == {("alpha", "line1\nline2"), ("beta", "x")}


def test_compression_codec_roundtrips(spark, sf_dir, tmp_path):
    """Storage-format codec surface (IO/compress — Default/Gzip/BZip2/LZO):
    gzip text and zstd/snappy parquet round trips preserve the relation."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    want = {(r["n_nationkey"], r["n_name"]) for r in n.collect()}

    gz = str(tmp_path / "gz_text")
    n.select(F.concat_ws("\t", "n_nationkey", "n_name").alias("value")) \
        .write.option("compression", "gzip").text(gz)
    import glob as g
    assert g.glob(gz + "/*.gz"), "gzip codec not applied"
    back = spark.read.text(gz).select(
        F.split("value", "\t")[0].cast("long").alias("k"), F.split("value", "\t")[1].alias("v"))
    assert {(r["k"], r["v"]) for r in back.collect()} == want

    for codec in ("zstd", "snappy"):
        p = str(tmp_path / f"pq_{codec}")
        n.write.option("compression", codec).parquet(p)
        assert g.glob(f"{p}/*.{codec}.parquet"), f"{codec} codec not applied"
        assert {(r["n_nationkey"], r["n_name"]) for r in spark.read.parquet(p).collect()} == want


def test_codec_roundtrip_files_are_compressed(spark, sf_dir):
    """codec_roundtrip's identity oracle would pass on an uncompressed
    write — this twin proves compression engaged: the csv route emits
    .csv.gz part files and the parquet route's footer records ZSTD for
    every column chunk."""
    import glob as g

    import pyarrow.parquet as pq

    from quatrain_mapreduce_spark.plans.sources_queries import codec_roundtrip
    from quatrain_mapreduce_spark.staging import stage_dir

    out = codec_roundtrip(spark, sf_dir)
    assert out.count() > 0

    gz_files = g.glob(stage_dir(sf_dir, "codecgz") + "/*.csv.gz")
    assert gz_files, "gzip csv route produced no .csv.gz part files"
    bz_files = g.glob(stage_dir(sf_dir, "codecbz2") + "/*.csv.bz2")
    assert bz_files, "bzip2 csv route produced no .csv.bz2 part files"

    for staged, want in (("codeczstd", "ZSTD"), ("codeclz4", "LZ4")):
        pq_files = g.glob(stage_dir(sf_dir, staged) + "/*.parquet")
        assert pq_files, f"{want} parquet route produced no parquet files"
        meta = pq.ParquetFile(pq_files[0]).metadata
        codecs = {
            meta.row_group(rg).column(c).compression
            for rg in range(meta.num_row_groups)
            for c in range(meta.num_columns)
        }
        # Spark's "lz4" parquet codec writes LZ4_RAW frames since Parquet
        # deprecated the original Hadoop LZ4 block format
        assert codecs <= {want, f"{want}_RAW"} and codecs, (
            f"parquet footer codecs for {staged}: {codecs}")


def test_compact_files_hits_target_count(spark, tmp_path):
    """compact_files sizes output from filesystem bytes: 32 small files
    collapse to the returned ceil(bytes/target) count, content preserved."""
    from quatrain_mapreduce_spark.sources.sinks import compact_files, dir_bytes

    src, dst = str(tmp_path / "small"), str(tmp_path / "compact")
    df = spark.range(50_000).selectExpr("id", "id * 2 AS v")
    df.repartition(32).write.parquet(src)
    n_out = compact_files(spark, src, dst, target_bytes=dir_bytes(spark, src) // 4 + 1)
    import glob
    parts = glob.glob(f"{dst}/part-*.parquet")
    assert len(parts) == n_out <= 4
    back = spark.read.parquet(dst)
    assert back.count() == 50_000
    assert back.selectExpr("sum(v)").first()[0] == df.selectExpr("sum(v)").first()[0]


def test_schema_evolution_merge_null_pads(spark, tmp_path):
    """mergeSchema read over batches with disjoint column tails: missing
    columns come back null, shared columns align by name."""
    spark.createDataFrame([(1, 10.0)], "k int, a double").write.parquet(str(tmp_path / "b1"))
    spark.createDataFrame([(2, "x")], "k int, b string").write.parquet(str(tmp_path / "b2"))
    got = (
        spark.read.option("mergeSchema", "true")
        .parquet(str(tmp_path / "b1"), str(tmp_path / "b2"))
        .orderBy("k").collect()
    )
    assert [(r["k"], r["a"], r["b"]) for r in got] == [(1, 10.0, None), (2, None, "x")]


def test_distcp_copies_bytes_identically(spark, tmp_path):
    """distcp must reproduce every file byte-for-byte under its original
    name, parallelized over executors (DistCp parity)."""
    import glob as g
    import os

    from quatrain_mapreduce_spark.sources.sinks import distcp

    src = str(tmp_path / "src")
    n = load_table(spark, "/root/testdata/sf0.001", "nation")
    n.repartition(8).write.mode("overwrite").parquet(src)
    files = sorted(g.glob(src + "/*.parquet"))
    dst = str(tmp_path / "dst")
    assert distcp(spark, files, dst) == len(files)
    for f in files:
        out = os.path.join(dst, os.path.basename(f))
        with open(f, "rb") as a, open(out, "rb") as b:
            assert a.read() == b.read(), f
    want = {(r["n_nationkey"], r["n_name"]) for r in n.collect()}
    assert {(r["n_nationkey"], r["n_name"]) for r in spark.read.parquet(dst).collect()} == want


def test_har_pack_unpack_and_indexed_point_read(spark, tmp_path):
    """har_create packs N small files into ONE archive file; har_extract
    reproduces every byte; har_get's equality filter on the sorted name
    column is pushed to the archive scan (the HAR index analogue)."""
    import glob as g
    import os

    from quatrain_mapreduce_spark.sources.sinks import har_create, har_extract, har_get

    src = str(tmp_path / "src")
    n = load_table(spark, "/root/testdata/sf0.001", "nation")
    n.repartition(8).write.mode("overwrite").parquet(src)
    files = sorted(g.glob(src + "/*.parquet"))

    har = str(tmp_path / "har")
    assert har_create(spark, src, har, target_files=1) == len(files)
    # many files in, one archive data file out
    assert len(g.glob(har + "/*.parquet")) == 1

    # point read prunes via a pushed equality filter on name
    name = os.path.basename(files[3])
    got = har_get(spark, har, name)
    plan = got._jdf.queryExecution().executedPlan().toString()
    from tests.test_plans import pushed_filter_brackets
    assert any(f"EqualTo(name,{name})" in b for b in pushed_filter_brackets(plan)), plan
    [row] = got.collect()
    with open(files[3], "rb") as f:
        assert bytes(row["content"]) == f.read()

    # full unpack: byte-identical files, parquet still readable
    out = str(tmp_path / "out")
    assert har_extract(spark, har, out) == len(files)
    for f in files:
        with open(f, "rb") as a, open(os.path.join(out, os.path.basename(f)), "rb") as b:
            assert a.read() == b.read(), f
    want = {(r["n_nationkey"], r["n_name"]) for r in n.collect()}
    assert {(r["n_nationkey"], r["n_name"]) for r in spark.read.parquet(out).collect()} == want


def test_split_sizing_controls_scan_parallelism(spark, tmp_path):
    """NLineInputFormat / CombineFileInputFormat parity
    (MR/lib/NLineInputFormat.java:59 — bound records per split;
    MultiFileInputFormat — pack many small files per split): Spark expresses
    both as scan sizing confs, not operators. One big file splits into many
    partitions under a small maxPartitionBytes cap; many small files combine
    into few partitions under the same cap + openCostInBytes. Row counts are
    invariant either way."""
    big = tmp_path / "big"
    big.mkdir()
    line = ("x" * 99) + "\n"
    (big / "part-0.txt").write_text(line * 20000)  # ~2 MB single file
    many = tmp_path / "many"
    many.mkdir()
    for i in range(20):
        (many / f"f{i}.txt").write_text(line * 50)  # 20 tiny files

    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        # NLine shape: cap split size -> one big file fans out to many tasks
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        df_big = spark.read.text(str(big))
        assert df_big.rdd.getNumPartitions() >= 8
        assert df_big.count() == 20000
        # MultiFile shape: 20 tiny files pack into few splits once the
        # per-file open cost stops padding each 5 KB file past the cap
        # (openCostInBytes IS the packing knob — its 4 MB default models
        # seek cost and deliberately keeps one small file per task)
        spark.conf.set("spark.sql.files.openCostInBytes", str(1024))
        # minPartitionNum=1 stops the bytes-per-core floor from re-splitting
        # a tiny dataset across all 32 local cores — the combine decision
        # should follow data size, as it would on a real cluster
        spark.conf.set("spark.sql.files.minPartitionNum", "1")
        df_many = spark.read.text(str(many))
        assert df_many.rdd.getNumPartitions() <= 4
        assert df_many.count() == 20 * 50
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_open)
        spark.conf.unset("spark.sql.files.minPartitionNum")
