"""Similarity search over embedding columns (array<float>).

Engine extension (no reference analogue). Two tiers:

- brute_force_topk: exact cosine top-k of every query against the corpus.
  Queries are broadcast (small side), candidates stream — one scan of the
  corpus, no shuffle of the big side; per-pair math is JVM-side
  (zip_with/aggregate inside codegen). The correctness baseline.

- lsh_topk: random-hyperplane LSH (Charikar '02), multi-table: L independent
  hash tables of ``n_planes`` sign bits each; search compares only within
  matching (table, bucket) cells, optionally multi-probing hamming-1
  neighbor buckets. Recall is governed by L × multiprobe; cost stays linear
  and bucket-partitioned. At 100 TB raise ``n_planes`` (bucket count grows
  2^n_planes) and L together instead of widening buckets.

- embedding_neardup_pairs: banded sign-signature blocking (pigeonhole: two
  vectors whose sign patterns differ in < n_bands positions share at least
  one identical band), cosine-verified, with a ``max_bucket`` skew cap like
  the minhash/simhash pipelines.

Vector dimensionality is an explicit parameter everywhere (it is pipeline
configuration, like the embedding model itself); ``embedding_dim`` reads it
from a parquet footer + first value locally — a metadata peek, never a Spark
job in the query plan.

All arithmetic is float→double widened, sequential-fold accumulation, so
results are deterministic and engine-comparable.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def embedding_dim(parquet_path: str, vec_col: str = "embedding") -> int:
    """Vector dimensionality from one locally-read value (pyarrow, no Spark
    job). In production the dim is pipeline config; this helper exists so
    test harnesses don't hardcode it."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(parquet_path)
    batch = next(pf.iter_batches(batch_size=1, columns=[vec_col]))
    return len(batch.column(0)[0])


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, id_col: str, vec_col: str, k: int = 10
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × streamed corpus, rank window.

    Emits (q_id, neighbor_id, rk, cos) with cos rounded to 6dp and id
    tie-breaks, so ranking is deterministic.
    """
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed → reproducible buckets)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def _sign_term(vec_col: str, p: list[float], weight: int) -> str:
    """SQL text for ``weight * (sign(vec · p) >= 0)`` — a constant plane dot
    product as pure expression text."""
    arr = "array(" + ",".join(f"{v!r}D" for v in p) + ")"
    dot = (f"aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), {arr}, "
           f"(x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    return f"(CASE WHEN {dot} >= 0D THEN {weight} ELSE 0 END)"


def lsh_bucket(vec_col: str, planes: list[list[float]]) -> Column:
    """Pack sign(vec · plane_i) bits into an integer bucket id.

    Built as ONE F.expr string: constructing the same tree with
    F.lit/F.array/python-lambda HOFs costs a py4j round trip per element and
    per lambda — measured at 4-5 s of pure driver time for 80 planes × 64
    dims. A single SQL string parses JVM-side in one call (~0.1 s)."""
    terms = [_sign_term(vec_col, p, 1 << i) for i, p in enumerate(planes)]
    return F.expr("CAST((" + " + ".join(terms) + ") AS INT)")


def sign_bits(vec_col: str, planes: list[list[float]]) -> list[Column]:
    """One 0/1 bit per hyperplane: sign(vec · plane_i) >= 0."""
    return [F.expr(_sign_term(vec_col, p, 1)) for p in planes]


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_planes: int = 10,
    n_tables: int = 4,
    multiprobe: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH.

    L = ``n_tables`` independent tables, each bucketing on ``n_planes`` sign
    bits; a candidate is any corpus vector sharing a (table, bucket) cell with
    the query in ANY table. ``multiprobe`` additionally probes every
    hamming-1 bucket per table. Cost: corpus stored L times (explode), joins
    stay bucket-partitioned; recall rises as 1-(1-p^b)^L.
    """
    tables = [hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tab"), lsh_bucket(vec_col, planes).alias("bucket"))
            for t, planes in enumerate(tables)
        ])).alias("cell"),
    ).select("neighbor_id", "c_vec", "cell.tab", "cell.bucket")
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        *[lsh_bucket(vec_col, planes).alias(f"qb{t}") for t, planes in enumerate(tables)],
    )
    probe_cells = []
    for t in range(n_tables):
        probe_cells.append(F.struct(F.lit(t).alias("tab"), F.col(f"qb{t}").alias("bucket")))
        if multiprobe:
            probe_cells.extend(
                F.struct(F.lit(t).alias("tab"), F.col(f"qb{t}").bitwiseXOR(F.lit(1 << i)).alias("bucket"))
                for i in range(n_planes)
            )
    q = q.select("q_id", "q_vec", F.explode(F.array(*probe_cells)).alias("cell")).select(
        "q_id", "q_vec", "cell.tab", "cell.bucket"
    )
    scored = (
        c.join(F.broadcast(q), ["tab", "bucket"])
        .where(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", "q_vec", "c_vec")
        .dropDuplicates(["q_id", "neighbor_id"])
        .select("q_id", "neighbor_id", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_bands: int = 4,
    max_bucket: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded sign-signature blocking.

    The ``n_planes`` sign bits are split into ``n_bands`` bands; a pair is a
    candidate iff it matches on ALL bits of at least one band (pigeonhole:
    sign-hamming < n_bands ⇒ some band identical — near-identical vectors
    flip very few signs). Oversized buckets are dropped from candidate
    generation (non-discriminative band; other bands still cover the pair),
    capping the self-join under skew exactly like the minhash/simhash
    pipelines.
    """
    planes = hyperplanes(dim, n_planes, seed)
    bits = sign_bits(vec_col, planes)
    per_band = n_planes // n_bands
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            sum(bits[b * per_band + i] * (1 << i) for i in range(per_band)).alias("bkey"),
        )
        for b in range(n_bands)
    ]
    v = df.select(F.col(id_col), F.col(vec_col).alias("vec"), F.explode(F.array(*bands)).alias("bd")) \
          .select(id_col, "vec", "bd.band", "bd.bkey")
    w = Window.partitionBy("band", "bkey")
    v = v.withColumn("n", F.count("*").over(w)).where(F.col("n") <= max_bucket).drop("n")
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"),
                F.col("a.vec").alias("a_vec"), F.col("b.vec").alias("b_vec"))
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
