"""Query registry — the engine's acceptance surface.

Each implemented operator/query from SURVEY.md §2 registers itself here with
(a) a Spark callable ``(spark, sf_dir) -> DataFrame`` and (b) where
expressible, an ANSI-SQL oracle string that DuckDB runs over the same parquet
tables. The driver compares both at sf=0.01 (row count + schema +
order-insensitive value hash), mirroring the reference's golden-file `.q`
test method (QTestUtil diff — SURVEY.md §5).

Determinism rules every registered query follows:
- every computed column is aliased identically in Spark and SQL;
- aggregate doubles are rounded (2dp for sums, 4dp for avgs) to absorb
  partition-order float noise; per-row arithmetic is left raw (bit-identical
  across engines for identical expression trees);
- LIMIT is always preceded by a total order with a unique tie-break key;
- double→int conversions go through floor(round(x, 2)) — never a bare cast,
  whose trunc-vs-round semantics differ between engines;
- rounding a COMPUTED double (x*1.1 etc.) uses floor(x*10^d + 0.5)/10^d, not
  round(x, d): Spark's round() rounds the shortest-decimal string of the
  double while DuckDB rounds the binary value — they disagree on ties like
  9168.005 (raw column passthroughs and post-aggregate rounding are safe;
  the tie case needs a value that is exactly representable mid-digit, which
  aggregates of many doubles don't hit but scaled money columns do).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 queries in the order
# ``queries()`` yields them (observed cap in CORRECTNESS_r03.json). With >50
# registered queries, naive registration order left the whole SQL / streaming /
# UDF / source surface unchecked. This tuple pins the gate window and is
# GENERATED, not hand-curated (r11 verdict directive #4):
#
#   python tools/coverage_rotation.py --emit-window --through <round>
#
# Composition rule (tools/coverage_rotation.py::emit_window, enforced by
# tests/test_driver_window.py): the never-green oracled queue first
# (attestation debt drains before anything else), then each plan module's
# MOST STALE green query as its representative, then the remaining slots
# filled with the oldest-last-green oracled queries repo-wide — so every
# round's window refreshes the oldest attestations and max driver-green
# staleness strictly decreases. WINDOW_LEDGER_THROUGH records which ledger
# prefix generated the tuple, making the proposal recomputable after newer
# CORRECTNESS artifacts land; the enforcement test also requires the prefix
# to lag the newest artifact by at most one round, so each session must
# regenerate. The tail (checked locally by tools/check_oracle.py) holds the
# remaining green queries plus rows-only approximate operators whose
# oracles can't exist.
WINDOW_LEDGER_THROUGH = "r12"
DRIVER_WINDOW: tuple[str, ...] = (
    "merge_upsert_orders",  # last green: r05
    "multimodal_frames",  # last green: r05
    "online_agg_events",  # last green: r05
    "percentile_agg",  # last green: r05
    "pii_scrub",  # last green: r05
    "scd2_user_state",  # last green: r05
    "seqfile_roundtrip",  # last green: r05
    "sql_ddl_roundtrip",  # last green: r05
    "counters_observe",  # last green: r06
    "sketch_bounds",  # last green: r06
    "pivot_wide",  # last green: r05
    "range_frame_window",  # last green: r05
    "repetition_filter",  # last green: r05
    "rollup_agg",  # last green: r05
    "similarity_ivf_exact",  # last green: r05
    "skip_bad_records",  # last green: r05
    "sql_groupby2",  # last green: r05
    "sql_join2",  # last green: r05
    "sql_partition_pruning",  # last green: r05
    "sql_subq",  # last green: r05
    "sql_transform",  # last green: r05
    "stratified_sample",  # last green: r05
    "stream_dedup",  # last green: r05
    "stream_late_data",  # last green: r05
    "tpch_q3_shape",  # last green: r05
    "train_val_split",  # last green: r05
    "window_distribution",  # last green: r05
    "bigram_lm_score",  # last green: r06
    "bpe_pair_counts",  # last green: r06
    "chunk_documents",  # last green: r06
    "cooccurrence_lift",  # last green: r06
    "cq_moving_avg",  # last green: r06
    "cq_tumbling_window",  # last green: r06
    "cube_agg",  # last green: r06
    "dedup_incremental_lsh",  # last green: r06
    "dedup_keep_best",  # last green: r06
    "dedup_spans",  # last green: r06
    "distcp_roundtrip",  # last green: r06
    "doc_similarity_pairs",  # last green: r06
    "har_roundtrip",  # last green: r06
    "heavy_hitters_topk",  # last green: r06
    "jsonl_roundtrip",  # last green: r06
    "kv_text_roundtrip",  # last green: r06
    "multimodal_features",  # last green: r06
    "multiple_inputs_union",  # last green: r06
    "online_agg_topk",  # last green: r06
    "pipes_wordcount",  # last green: r06
    "salted_join_orders",  # last green: r06
    "seqfilter_scan",  # last green: r06
    "sessionize_events",  # last green: r06
)
# Rows-only by design (no SQL-expressible oracle; each differential- or
# precision-gated in pytest): bpe_train_merges, bpe_encode_corpus,
# similarity_pq, similarity_ivfpq, profile_orders_hll (float-codebook /
# HLL internals), k_core_members (anti-monotone peeling fixpoint),
# lpa_communities (iterative argmax propagation), hybrid_search_rrf_ivf
# (approximate dense side; fused-overlap differential vs the exact twin).


def all_queries() -> dict[str, Query]:
    """Import all plan modules (side-effect: registration) and return REGISTRY
    ordered so the driver's 50-query gate window samples every module."""
    from quatrain_mapreduce_spark.plans import (  # noqa: F401
        relational, mrlib, data_pipeline, curation_queries, streaming_queries,
        hive_sql, udf_surface, sources_queries, temporal_queries,
        analytics_queries,
    )

    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    return ordered
