"""Sketch/sampling tier gate (the r9 staged queries, promoted to the live
registry in r10): each must pass the same Spark-vs-DuckDB compare the driver
applies, at TWO scale factors, so the oracle compare isn't tuned to one data
shape. The queries live in their plan modules now (analytics_queries /
curation_queries); this file keeps the two-scale pytest gate plus the
semantic invariants no SQL oracle can express (chunk coverage, sample
determinism).

Compare mirrors tools/check_oracle.py: row count, column-name set, and
values with columns sorted by name and rows sorted — exact (every query
here emits only ints/strings/md5 hex, no floats, by design)."""

from __future__ import annotations

import duckdb
import pytest

from quatrain_mapreduce_spark.catalog import TABLES
from quatrain_mapreduce_spark.registry import all_queries
from tests.conftest import SF_DIR, SF_DIR_MID

PROMOTED = (
    "theta_audience_overlap",
    "theta_cube_serving",
    "kll_quantile_rollup",
    "stratified_sample_exact",
    "doc_token_chunks",
    # r10 late addition: the frequency member of the sketch tier
    "heavy_hitters_cms",
)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(r[i] for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


@pytest.mark.parametrize("name", PROMOTED)
@pytest.mark.parametrize("sf_dir_case", [SF_DIR, SF_DIR_MID])
def test_sketch_sampling_query_matches_oracle(spark, name, sf_dir_case):
    q = all_queries()[name]
    sdf = q.fn(spark, sf_dir_case)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir_case}/{t}.parquet')"
        )
    res = con.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: schema {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    assert len(srows) > 0, f"{name}: empty result"
    assert _normalize(srows, scols) == _normalize(drows, dcols), name


def test_chunks_cover_every_token_and_respect_stride(spark):
    """Coverage invariant, independent of the oracle: with size 64 and
    stride 48, chunk i starts at token 48*i, every token of every document
    falls in at least one chunk, and consecutive chunks overlap by exactly
    16 tokens (except the final short chunk). Verified in pure Python
    against the documents fixture."""
    rows = (
        all_queries()["doc_token_chunks"].fn(spark, SF_DIR)
        .groupBy("doc_id")
        .agg(
            {"chunk_id": "max", "n_toks": "sum", "*": "count"},
        )
        .collect()
    )
    con = duckdb.connect()
    ntoks = dict(con.execute(
        "SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x <> ''))"
        f" FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall())
    for r in rows:
        d = r.asDict()
        n, max_id, n_chunks = ntoks[d["doc_id"]], d["max(chunk_id)"], d["count(1)"]
        # chunk ids are dense 0..max
        assert n_chunks == max_id + 1
        # last chunk starts before the end -> every token covered
        assert max_id * 48 < max(n, 1)
        # one more chunk would start past the end -> no empty tail chunks
        assert (max_id + 1) * 48 >= min(n, max(n, 1) - 15) or n <= 64
        # total sliced tokens = n + 16 overlap per interior boundary,
        # truncated at the tail: n_toks summed equals sum over chunks of
        # min(64, n - 48*i)
        expect = sum(min(64, n - 48 * i) for i in range(max_id + 1)) if n else 0
        assert d["sum(n_toks)"] == max(expect, 0), (d, n)


def test_stratified_sample_is_exact_k_and_deterministic(spark):
    """Per stratum: exactly min(k, |stratum|) rows, and two independent
    plan executions pick the IDENTICAL member set (md5 rank has no RNG,
    no partition-order dependence)."""
    fn = all_queries()["stratified_sample_exact"].fn
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert a == b and len(a) > 0

    con = duckdb.connect()
    sizes = dict(con.execute(
        "SELECT c_mktsegment, count(*) FROM "
        f"read_parquet('{SF_DIR}/customer.parquet') GROUP BY 1"
    ).fetchall())
    from collections import Counter

    got = Counter(seg for seg, _, _ in a)
    for seg, n in sizes.items():
        assert got[seg] == min(10, n)


def test_cms_cells_merge_by_addition_across_corpus_shards(spark):
    """The 100 TB property: CMS state built per corpus shard and folded by
    cell-wise ADDITION equals the whole-corpus sketch — so shards never
    need a token-domain shuffle, only a <=4096-row merge. Split documents
    into two halves by doc_id parity, build cells per half through the
    same arithmetic as the registered query, sum, and compare against the
    whole-corpus cells; then pin the one-sided guarantee on the output."""
    from pyspark.sql import functions as F

    from quatrain_mapreduce_spark.catalog import load_table
    from quatrain_mapreduce_spark.operators.curation import cms_probes

    docs = load_table(spark, SF_DIR, "documents")

    def cells_of(frame):
        # the registered query's own probe builder — the mergeability
        # claim must hold for the actual arithmetic, not a transcription
        toks = frame.select(
            F.explode(F.expr("filter(split(lower(text), ' '), x -> x <> '')"))
            .alias("tok")
        )
        return (
            toks.select(F.explode(cms_probes("tok")).alias("rb"))
            .groupBy(F.col("rb.i").alias("i"), F.col("rb.b").alias("b"))
            .agg(F.count("*").cast("bigint").alias("c"))
        )

    whole = {(r["i"], r["b"]): r["c"] for r in cells_of(docs).collect()}
    merged: dict = {}
    for half in (docs.where(F.col("doc_id") % 2 == 0),
                 docs.where(F.col("doc_id") % 2 == 1)):
        for r in cells_of(half).collect():
            k = (r["i"], r["b"])
            merged[k] = merged.get(k, 0) + r["c"]
    assert merged == whole

    out = all_queries()["heavy_hitters_cms"].fn(spark, SF_DIR).collect()
    assert len(out) == 20
    assert all(r["one_sided_ok"] == 1 for r in out)  # est >= exact, always
    assert all(r["cms_est"] >= r["n_exact"] for r in out)


def test_cms_xxhash64_production_tier_holds_the_same_guarantees(spark):
    """The production hash tier (xxhash64 intrinsic instead of the
    oracle-portable md5 nibbles) must satisfy the same sketch contract:
    bounded cells, shard mergeability, and the one-sided est >= exact
    guarantee for the true top-20. No SQL oracle exists for this tier
    (DuckDB has no xxhash64) — this differential test IS its gate."""
    from pyspark.sql import functions as F

    from quatrain_mapreduce_spark.catalog import load_table
    from quatrain_mapreduce_spark.operators.curation import cms_probes
    from quatrain_mapreduce_spark.plans.analytics_queries import (
        cms_serve_top20,
    )

    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(
        F.explode(F.expr("filter(split(lower(text), ' '), x -> x <> '')"))
        .alias("tok")
    )

    def cells_of(frame):
        return (
            frame.select(F.explode(cms_probes("tok", hash="xxhash64")).alias("rb"))
            .groupBy(F.col("rb.i").alias("i"), F.col("rb.b").alias("b"))
            .agg(F.count("*").cast("bigint").alias("c"))
        )

    cells = cells_of(toks)
    assert cells.count() <= 4096

    # mergeability across doc_id-parity shards (same property as portable)
    whole = {(r["i"], r["b"]): r["c"] for r in cells.collect()}
    merged: dict = {}
    for half in (docs.where(F.col("doc_id") % 2 == 0),
                 docs.where(F.col("doc_id") % 2 == 1)):
        htoks = half.select(
            F.explode(F.expr("filter(split(lower(text), ' '), x -> x <> '')"))
            .alias("tok")
        )
        for r in cells_of(htoks).collect():
            k = (r["i"], r["b"])
            merged[k] = merged.get(k, 0) + r["c"]
    assert merged == whole

    out = cms_serve_top20(toks, cells, hash="xxhash64").collect()
    assert len(out) == 20
    assert all(r["one_sided_ok"] == 1 for r in out)
