"""Staged queries — implemented and oracle-tested, NOT yet registered.

Oracled registration is frozen until the driver-gate rotation queue drains
(registry.py — the 50-row gate window must attest the 38 never-green rows
first). These queries are complete: Spark plan, DuckDB oracle, pytest
compare at two SFs (tests/test_staged_queries.py), plan-lint clean. Next
round they move to their plan modules with a plain ``@register`` and a
driver-window slot; nothing else changes.

Contents extend the sketch/sampling tier of the LLM-pipeline surface:

- ``theta_audience_overlap`` — Theta-sketch set algebra (union AND
  intersection estimates are mergeable state — HLL can't intersect), the
  segment-overlap pattern a 100 TB audience/dedup cube needs.
- ``kll_quantile_rollup`` — mergeable quantile sketches: per-group KLL
  state unioned to answer global percentiles without a corpus sort.
- ``stratified_sample_exact`` — deterministic exact-k per-stratum sample
  (md5-ordered rank), the eval-set carve-out that is reproducible across
  engines and runs, unlike TABLESAMPLE.
- ``doc_token_chunks`` — fixed-size token windows with overlap (context-
  window packing prep), scan-local explode, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quatrain_mapreduce_spark.catalog import load_table
from quatrain_mapreduce_spark.registry import Query, QueryFn

STAGED: dict[str, Query] = {}


def stage(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED:
            raise ValueError(f"duplicate staged query: {name}")
        STAGED[name] = Query(name=name, fn=fn, oracle=oracle,
                             doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


@stage(
    "theta_audience_overlap",
    oracle="""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        card AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_overlap
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT p.type_a, p.type_b, ca.n AS n_a, cb.n AS n_b, p.n_overlap,
               ca.n + cb.n - p.n_overlap AS n_union,
               1 AS inter_ok, 1 AS union_ok
        FROM pairs p
        JOIN card ca ON ca.event_type = p.type_a
        JOIN card cb ON cb.event_type = p.type_b
    """,
    doc="Theta-sketch set algebra (Datasketches theta_sketch_agg / "
        "theta_union / theta_intersection): one sketch per event type, then "
        "the FULL pairwise audience-overlap matrix answered from sketch "
        "algebra alone — union AND intersection estimates without touching "
        "events again. HLL only unions; theta intersects, which is why a "
        "100 TB audience/segment cube stores theta state. Both estimates "
        "are gated in-plan against the exact overlap (10%/5% tolerance; "
        "oracle pins the ok-flags). The exact side costs one distinct "
        "(user,type) shuffle + a per-user self-join (type sets are tiny); "
        "at scale only the sketch side runs. Supersedes the reference's "
        "exact-only UniqValueCount (MR/lib/aggregate/UniqValueCount.java).",
    tags=("analytics", "sketch", "approx", "staged"),
)
def theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    card = ut.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.expr("theta_sketch_agg(user_id)").alias("sk"),
    )
    overlap = (
        ut.alias("a")
        .join(ut.alias("b"),
              (F.col("a.user_id") == F.col("b.user_id"))
              & (F.col("a.event_type") < F.col("b.event_type")))
        .groupBy(F.col("a.event_type").alias("type_a"),
                 F.col("b.event_type").alias("type_b"))
        .agg(F.count("*").alias("n_overlap"))
    )
    ca = card.select(F.col("event_type").alias("type_a"),
                     F.col("n").alias("n_a"), F.col("sk").alias("sk_a"))
    cb = card.select(F.col("event_type").alias("type_b"),
                     F.col("n").alias("n_b"), F.col("sk").alias("sk_b"))
    # the pair frame is (|types| choose 2) rows — broadcast-sized by
    # construction; sketch algebra evaluates on that tiny frame
    j = (
        overlap.join(F.broadcast(ca), "type_a").join(F.broadcast(cb), "type_b")
        .withColumn("inter_est",
                    F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))"))
        .withColumn("union_est",
                    F.expr("theta_sketch_estimate(theta_union(sk_a, sk_b))"))
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_overlap"))
    )
    return j.select(
        "type_a", "type_b", "n_a", "n_b", "n_overlap", "n_union",
        ((F.abs(F.col("inter_est") - F.col("n_overlap")) / F.col("n_overlap"))
         <= 0.10).cast("int").alias("inter_ok"),
        ((F.abs(F.col("union_est") - F.col("n_union")) / F.col("n_union"))
         <= 0.05).cast("int").alias("union_ok"),
    )


@stage(
    "theta_cube_serving",
    oracle="""
        WITH b AS (
            SELECT min(CAST(ts AS DATE)) + 2 AS d1,
                   min(CAST(ts AS DATE)) + 8 AS d2
            FROM events
        )
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
               1 AS theta_ok
        FROM events, b
        WHERE CAST(ts AS DATE) BETWEEN b.d1 AND b.d2
        GROUP BY event_type
    """,
    doc="Sketch CUBE serving — the stored-state form of the sketch tier: "
        "per-(day, event_type) theta sketches are staged to parquet ONCE "
        "(binary column, idempotent marker dir like the LSH/IVF indexes), "
        "and an arbitrary date-range distinct-user question is answered by "
        "theta_union_agg over the STORED sketches — days x types rows of "
        "bytes, zero events scan at serve time. The exact twin (computed "
        "from events in-plan, verification only) gates the estimate; the "
        "oracle pins the flag. This is what replaces nightly full-corpus "
        "COUNT(DISTINCT) at 100 TB: any rollup window is a merge of a "
        "bounded sketch table, and theta (unlike HLL) keeps intersection/ "
        "difference algebra available on the same stored state.",
    tags=("analytics", "sketch", "approx", "staged"),
)
def theta_cube_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from quatrain_mapreduce_spark.staging import stage_dir

    ev = load_table(spark, sf_dir, "events")
    cube_dir = stage_dir(sf_dir, "thetacube")
    marker = os.path.join(cube_dir, "_STAGED")
    if not os.path.exists(marker):
        (
            ev.groupBy(F.to_date("ts").alias("day"), "event_type")
            .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
            .write.mode("overwrite").parquet(cube_dir)
        )
        open(marker, "w").close()
    cube = spark.read.parquet(cube_dir)
    bounds = ev.agg(
        F.date_add(F.min(F.to_date("ts")), 2).alias("d1"),
        F.date_add(F.min(F.to_date("ts")), 8).alias("d2"),
    )
    est = (
        cube.join(F.broadcast(bounds),
                  (F.col("day") >= F.col("d1")) & (F.col("day") <= F.col("d2")))
        .groupBy("event_type")
        .agg(F.expr("theta_sketch_estimate(theta_union_agg(sk))").alias("est"))
    )
    exact = (
        ev.select("user_id", "event_type", F.to_date("ts").alias("day"))
        .join(F.broadcast(bounds),
              (F.col("day") >= F.col("d1")) & (F.col("day") <= F.col("d2")))
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact",
        ((F.abs(F.col("est") - F.col("n_exact")) / F.col("n_exact")) <= 0.05)
        .cast("int").alias("theta_ok"),
    )


@stage(
    "kll_quantile_rollup",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               1 AS p50_ok, 1 AS p95_ok
        FROM orders GROUP BY o_orderpriority
        UNION ALL
        SELECT 'ALL' AS o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               1 AS p50_ok, 1 AS p95_ok
        FROM orders
    """,
    doc="Mergeable quantile sketches (Datasketches KLL, "
        "kll_sketch_agg_double / kll_sketch_merge_double): one KLL sketch "
        "of o_totalprice per priority, then the GLOBAL p50/p95 answered by "
        "merging the per-group sketches — no corpus re-scan and, unlike "
        "exact percentile(), no single-node sort of all values. Estimates "
        "are gated in-plan against exact percentile BANDS (value at rank "
        "p±3%, comfortably above KLL k=400's ~1% rank error), so the "
        "output is deterministic despite KLL's randomized compaction; the "
        "oracle pins the ok-flags and checks the exact group counts. The "
        "100 TB shape: sketches are algebraic map-side state, persistable "
        "as a daily quantile cube (Karnin-Lang-Liberty, FOCS'16); exact "
        "twin kept as ground truth the same way sketch_mergeable_rollup "
        "gates HLL.",
    tags=("analytics", "sketch", "approx", "staged"),
)
def kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.expr("kll_sketch_agg_double(o_totalprice, 400)").alias("sk"),
        # exact rank bands: the value at quantile p-3% and p+3% bracket any
        # estimate whose rank error is under 3% — percentile() is exact
        F.expr("percentile(o_totalprice, array(0.47, 0.53, 0.92, 0.98))").alias("band"),
    )

    def gated(df: DataFrame) -> DataFrame:
        p50 = F.expr("kll_sketch_get_quantile_double(sk, 0.5)")
        p95 = F.expr("kll_sketch_get_quantile_double(sk, 0.95)")
        return df.select(
            "o_orderpriority", "n_orders",
            ((p50 >= F.col("band")[0]) & (p50 <= F.col("band")[1]))
            .cast("int").alias("p50_ok"),
            ((p95 >= F.col("band")[2]) & (p95 <= F.col("band")[3]))
            .cast("int").alias("p95_ok"),
        )

    total = orders.agg(
        F.count("*").alias("n_orders"),
        F.expr("percentile(o_totalprice, array(0.47, 0.53, 0.92, 0.98))").alias("band"),
    )
    # rollup tier merges the per-group sketches — no rescan of orders.
    # kll_sketch_merge_double is a PAIRWISE scalar (unlike hll_union_agg),
    # so fold it over the collected group sketches — a |groups|-sized list.
    merged = per.agg(F.collect_list("sk").alias("sks")).select(
        F.expr(
            "aggregate(slice(sks, 2, size(sks) - 1), sks[0],"
            " (acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("sk")
    )
    total_row = gated(
        total.crossJoin(F.broadcast(merged))
        .withColumn("o_orderpriority", F.lit("ALL"))
    )
    return gated(per).unionAll(total_row)


@stage(
    "stratified_sample_exact",
    oracle="""
        WITH ranked AS (
            SELECT c_mktsegment, c_custkey,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey
                   ) AS rk
            FROM customer
        )
        SELECT c_mktsegment, c_custkey, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 10
    """,
    doc="Deterministic exact-k stratified sample: rank each stratum by "
        "md5(key) — a uniform, engine-portable, seed-free permutation — and "
        "keep the first k. Unlike TABLESAMPLE/rand() this is reproducible "
        "bit-for-bit across engines, runs, and partition layouts, which is "
        "what an eval-set carve-out or a human-review draw needs for "
        "provenance. One hash shuffle on the stratum key; the rank window "
        "never sees more than a stratum. At 100 TB strata are bounded "
        "(segments/domains/languages), and heavy strata are exactly what "
        "the existing salted/two-stage top-k handles (topk_per_group). "
        "Reference analogue: the percent/md5 record filters of "
        "SequenceFileInputFilter (MR/SequenceFileInputFilter.java) — this "
        "is the per-stratum, exact-size form.",
    tags=("curation", "sampling", "staged"),
)
def stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey")
    )
    return (
        cust.select("c_mktsegment", "c_custkey",
                    F.row_number().over(w).cast("bigint").alias("rk"))
        .where(F.col("rk") <= 10)
    )


@stage(
    "doc_token_chunks",
    oracle="""
        WITH wt AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ), spans AS (
            SELECT doc_id, toks,
                   unnest(range(CAST(floor((greatest(len(toks), 1) - 1) / 48)
                                     AS BIGINT) + 1)) AS chunk_id
            FROM wt
        )
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(len(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64))
                    AS BIGINT) AS n_toks,
               md5(array_to_string(
                   list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64),
                   ' ')) AS chunk_md5
        FROM spans
    """,
    doc="Context-window chunking: split every document into 64-token "
        "windows with stride 48 (16-token overlap so no training span is "
        "cut mid-context), emitting a content hash per chunk — the prep "
        "step before packing sequences into fixed-length training rows "
        "(packing_efficiency consumes exactly this shape). Scan-local: "
        "tokenize once, explode per-doc chunk indices, slice — zero "
        "shuffles, so at 100 TB it rides the document scan untouched. "
        "Window arithmetic is shared with dedup's rolling fingerprints "
        "(operators/dedup.py window_fingerprints); here the unit is the "
        "training chunk, not the 50-gram.",
    tags=("curation", "tokenize", "staged"),
)
def doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("toks"),
    )
    spans = toks.select(
        "doc_id", "toks",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.floor((F.greatest(F.size("toks"), F.lit(1)) - 1) / 48),
            )
        ).alias("chunk_id", "_start"),
    )
    chunk = F.slice("toks", F.col("chunk_id") * 48 + 1, 64)
    return spans.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_toks"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )
