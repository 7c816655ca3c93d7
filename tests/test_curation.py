"""Curation-operator tests: planted-case semantics + determinism + plan shape.

The oracle suite (plans/curation_queries.py) value-checks these against
DuckDB on real testdata; these tests pin the SEMANTIC contracts on synthetic
rows where the expected answer is known by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quatrain_mapreduce_spark.operators.curation import (
    cap_per_domain, decontaminate, h16, scrub_pii, stratified_sample,
    train_val_split,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stratified_sample_deterministic_and_respects_quota(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = stratified_sample(docs, "doc_id", "lang", {"en": 300}, default_quota=800)
    b = stratified_sample(docs, "doc_id", "lang", {"en": 300}, default_quota=800)
    ka = sorted(r.doc_id for r in a.where("__kept = 1").select("doc_id").collect())
    kb = sorted(r.doc_id for r in b.where("__kept = 1").select("doc_id").collect())
    assert ka == kb and len(ka) > 0
    rates = {
        r.lang: r.rate
        for r in a.groupBy("lang").agg((F.avg("__kept")).alias("rate")).collect()
    }
    # 16-bit hash at sf0.001 strata (~10-50 docs) — generous tolerance, but
    # the en quota (0.30) and tail quota (0.80) must stay separated.
    assert rates["en"] < 0.6
    assert all(v > 0.5 for k, v in rates.items() if k != "en")


def test_train_val_split_disjoint_and_stable(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = train_val_split(docs, "doc_id", val_permille=200)
    counts = dict(s.groupBy("split").count().collect())
    assert set(counts) == {"train", "val"}
    # same row never changes split
    again = train_val_split(docs, "doc_id", val_permille=200)
    diff = (
        s.select("doc_id", "split")
        .join(again.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .where("split <> s2")
        .count()
    )
    assert diff == 0


def test_cap_per_domain_keeps_k_highest_quality(spark):
    stop = "the a and is"  # high stop-ratio text scores higher at equal length
    rows = [(i, "src0", (stop + " ") * 25 if i == 7 else "zz yy xx ww vv") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = cap_per_domain(df, "doc_id", "source", "text", k=3)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert len(ids) == 3
    assert 7 in ids  # the planted high-quality doc always survives the cap
    # ties broken by doc_id: the remaining slots go to the lowest ids
    assert ids == [0, 1, 7]


def test_decontaminate_removes_ngram_overlap_only(spark):
    eval_doc = (100, "alpha beta gamma delta epsilon zeta")
    contaminated = (1, "prefix words alpha beta gamma delta suffix")  # shares a 4-gram
    clean = (2, "totally unrelated content with other tokens here")
    near_miss = (3, "alpha beta gamma other words entirely now")  # only a 3-gram overlap
    df = _docs(spark, [eval_doc, contaminated, clean, near_miss])
    eval_ids = df.where("doc_id = 100").select("doc_id")
    kept = sorted(
        r.doc_id for r in decontaminate(df, "doc_id", "text", eval_ids, n=4).collect()
    )
    assert kept == [2, 3]  # eval doc itself and the 4-gram match are gone


def test_scrub_pii_redacts_and_counts(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jo.doe@example.org or call 555-867-5309 ok"),
            (2, "no pii here"),
            (3, "two mails a@b.io c@d.net and 111-222-3333 444-555-6666"),
        ],
    )
    out = {r.doc_id: r for r in scrub_pii(df, "text").collect()}
    assert (out[1].n_emails, out[1].n_phones) == (1, 1)
    assert "<EMAIL>" in out[1].scrubbed and "<PHONE>" in out[1].scrubbed
    assert "example.org" not in out[1].scrubbed and "555-867" not in out[1].scrubbed
    assert (out[2].n_emails, out[2].n_phones) == (0, 0) and out[2].scrubbed == "no pii here"
    assert (out[3].n_emails, out[3].n_phones) == (2, 2)


def test_h16_uniform_enough(spark):
    # 16-bit portable hash over 10k ids: every decile bucket within ±20% of
    # uniform — catches nibble-decode mistakes that collapse the range.
    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    buckets = dict(
        df.select((h16("doc_id") % 10).alias("b")).groupBy("b").count().collect()
    )
    assert len(buckets) == 10
    assert all(800 <= v <= 1200 for v in buckets.values())


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_ids = docs.where(h16("doc_id") % 10 == 0).select("doc_id")
    kept = decontaminate(docs, "doc_id", "text", eval_ids, n=4)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # the eval-gram side (small by construction) must come in as a broadcast,
    # not a shuffled sort-merge join against the full corpus
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_dedup_spans_keeps_first_occurrence(spark):
    """A span shared between docs survives only in the earliest (doc, pos);
    surviving spans reassemble in original order."""
    from quatrain_mapreduce_spark.operators.curation import dedup_spans

    boiler = "a b c d"  # 4-token span shared by both docs
    docs = spark.createDataFrame(
        [(1, f"{boiler} u v w x"), (2, f"{boiler} y z q r"), (3, boiler)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["text_dedup"], r["n_spans_kept"])
           for r in dedup_spans(docs, "doc_id", "text", span_tokens=4).collect()}
    assert got[1] == (f"{boiler} u v w x", 2)   # first occurrence keeps both spans
    assert got[2] == ("y z q r", 1)             # shared span dropped, unique span kept
    assert 3 not in got                          # fully-duplicate doc drops out


def test_dedup_spans_string_ids_fall_back_to_struct_min(spark):
    """Non-integral ids must take the struct-min path (a decimal cast would
    NULL-collapse them silently — ADVICE r13) and keep their own type."""
    from quatrain_mapreduce_spark.operators.curation import dedup_spans

    boiler = "a b c d"
    docs = spark.createDataFrame(
        [("d1", f"{boiler} u v w x"), ("d2", f"{boiler} y z q r"), ("d3", boiler)],
        "doc_id string, text string",
    )
    out = dedup_spans(docs, "doc_id", "text", span_tokens=4)
    assert dict(out.dtypes)["doc_id"] == "string"
    got = {r["doc_id"]: (r["text_dedup"], r["n_spans_kept"]) for r in out.collect()}
    assert got["d1"] == (f"{boiler} u v w x", 2)
    assert got["d2"] == ("y z q r", 1)
    assert "d3" not in got


def test_dedup_spans_negative_ids_pack_exactly(spark):
    """The 2^63 bias makes the decimal packing exact over the FULL signed
    id range: keep-first must prefer the negative (smaller) id and decode
    it back unchanged."""
    from quatrain_mapreduce_spark.operators.curation import dedup_spans

    boiler = "a b c d"
    docs = spark.createDataFrame(
        [(-5, f"{boiler} u v w x"), (2, f"{boiler} y z q r")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["text_dedup"], r["n_spans_kept"])
           for r in dedup_spans(docs, "doc_id", "text", span_tokens=4).collect()}
    assert got[-5] == (f"{boiler} u v w x", 2)
    assert got[2] == ("y z q r", 1)


def test_dedup_spans_integral_ids_keep_hash_aggregate(spark):
    """The declared-query path (long ids) must still plan the packed
    HashAggregate form — zero SortAggregate in the winners stage."""
    from quatrain_mapreduce_spark.operators.curation import dedup_spans

    docs = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    plan = dedup_spans(docs, "doc_id", "text", span_tokens=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan


def test_pack_manifest_rejects_reserved_passthrough_names(spark):
    from quatrain_mapreduce_spark.operators.curation import pack_manifest

    docs = spark.createDataFrame([(1, 5, 0)], "doc_id long, n_tok long, shard int")
    with pytest.raises(ValueError, match="reserved"):
        pack_manifest(docs, "doc_id", "n_tok", seq_len=64, n_shards=8,
                      passthrough=("shard",))


def test_pack_manifest_is_contiguous_and_matches_global_cumsum(spark):
    """Distributed prefix sum must tile the token stream exactly: sorted by
    tok_start, each doc starts where the previous ended, and seq bounds are
    floor(start/L), floor((end-1)/L)."""
    from quatrain_mapreduce_spark.operators.curation import pack_manifest

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.pmod(F.col("id") * 37 + 11, F.lit(50)) + 1).alias("n_tok")
    )
    rows = sorted(
        pack_manifest(docs, "doc_id", "n_tok", seq_len=64, n_shards=8).collect(),
        key=lambda r: r["tok_start"],
    )
    expect_start = 0
    for r in rows:
        assert r["tok_start"] == expect_start
        assert r["first_seq"] == r["tok_start"] // 64
        assert r["last_seq"] == (r["tok_start"] + r["n_tok"] - 1) // 64
        expect_start += r["n_tok"]
    assert expect_start == sum(r["n_tok"] for r in rows)


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Component-keyed splitting must put every near-dup pair on ONE side of
    the train/val boundary, where the naive per-doc hash split provably
    leaks (2 of 6 ground-truth pairs straddle it on this fixture) — the
    negative control that makes leaked_pairs=0 meaningful rather than
    vacuous."""
    from tests.conftest import SF_DIR_MID

    from quatrain_mapreduce_spark.catalog import load_table
    from quatrain_mapreduce_spark.operators.curation import h16
    from quatrain_mapreduce_spark.operators.dedup import ngram_jaccard_pairs
    from quatrain_mapreduce_spark.plans.data_pipeline import leakage_safe_split

    docs = load_table(spark, SF_DIR_MID, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", block_col="lang", n=2, threshold=0.8
    ).select("a_id", "b_id")
    lab = docs.select(
        "doc_id", F.when(h16("doc_id") % 1000 < 950, "t").otherwise("v").alias("s")
    )
    la = lab.withColumnsRenamed({"doc_id": "a_id", "s": "sa"})
    lb = lab.withColumnsRenamed({"doc_id": "b_id", "s": "sb"})
    naive_leaked = pairs.join(la, "a_id").join(lb, "b_id").where(F.col("sa") != F.col("sb")).count()
    assert naive_leaked > 0, "fixture must make the naive split leak, else the test is vacuous"

    rows = leakage_safe_split(spark, SF_DIR_MID).collect()
    assert {r["split"] for r in rows} == {"train", "val"}
    assert all(r["leaked_pairs"] == 0 for r in rows)
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_temperature_sample_derived_rates(spark):
    """Strata 400/100/4 docs: head keeps 30%; a 4x-smaller stratum keeps
    sqrt(4)*30% = 60%; a 100x-smaller one caps at 100%. Membership is the
    portable hash — recomputed here independently."""
    from quatrain_mapreduce_spark.operators.curation import h16, temperature_sample

    rows = [(i, "head") for i in range(400)]
    rows += [(1000 + i, "mid") for i in range(100)]
    rows += [(2000 + i, "rare") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    s = temperature_sample(df, "doc_id", "lang", head_permille=300)
    thr = {r["lang"]: r["__thr"] for r in s.select("lang", "__thr").distinct().collect()}
    assert thr == {"head": 300, "mid": 600, "rare": 1000}
    # membership equals the hash predicate exactly (no rand() anywhere)
    bad = s.where(
        (F.col("__kept") == 1) != (h16("doc_id") % 1000 < F.col("__thr"))
    ).count()
    assert bad == 0
    # rare stratum is fully kept (rate capped at 1)
    assert s.where("lang = 'rare' AND __kept = 0").count() == 0


def test_mix_sources_copies_and_rep_indices(spark):
    """Weights 2.5/0.0/1.0: every 'a' doc emits 2 or 3 copies with reps
    exactly 0..copies-1, 'b' vanishes, default sources emit exactly once;
    the whole mixture is rerun-identical (no rand())."""
    from quatrain_mapreduce_spark.operators.curation import mix_sources

    rows = [(i, "a") for i in range(40)]
    rows += [(100 + i, "b") for i in range(10)]
    rows += [(200 + i, "c") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    m = mix_sources(df, "doc_id", "source", {"a": 2.5, "b": 0.0})
    per_doc = (
        m.groupBy("source", "doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sort_array(F.collect_list("__rep")).alias("reps"),
        )
        .collect()
    )
    assert all(r["n"] in (2, 3) for r in per_doc if r["source"] == "a")
    assert not any(r["source"] == "b" for r in per_doc)
    assert all(r["n"] == 1 for r in per_doc if r["source"] == "c")
    # rep indices are the exact contiguous range, never duplicated
    assert all(r["reps"] == list(range(r["n"])) for r in per_doc)
    # the fractional slice took SOME but not ALL of 'a' (0.5 of 40 docs;
    # the hash is fixed so this is a deterministic property of the ids)
    n_a = sum(r["n"] for r in per_doc if r["source"] == "a")
    assert 80 < n_a < 120
    again = mix_sources(df, "doc_id", "source", {"a": 2.5, "b": 0.0})
    assert sorted(m.collect()) == sorted(again.collect())


def test_training_export_is_contiguous_over_repetitions(spark, sf_dir):
    """The end-to-end manifest lays the MIXED stream (repetitions included)
    with no gaps or overlaps: offsets sorted by tok_start tile exactly, the
    total equals sum(n_tok), and example ids are unique."""
    from quatrain_mapreduce_spark.registry import all_queries

    pm = all_queries()["training_export"].fn(spark, sf_dir)
    rows = pm.orderBy("tok_start").collect()
    assert len({r["ex_id"] for r in rows}) == len(rows)
    pos = 0
    for r in rows:
        assert r["tok_start"] == pos
        pos += r["n_tok"]
    assert pos == sum(r["n_tok"] for r in rows)
    # repetition really reaches the manifest: some doc contributes >1 example
    from collections import Counter
    base = Counter(r["ex_id"].split("#")[0] for r in rows)
    assert max(base.values()) > 1


def test_chunk_documents_offsets_and_edges(spark):
    """Chunks tile with the configured overlap; empty text keeps its
    chunk_id=0 provenance row; overlap >= width is rejected."""
    import pytest as _pytest

    from quatrain_mapreduce_spark.operators.curation import chunk_documents

    text = "abcdefghij" * 5  # 50 chars
    df = spark.createDataFrame([(1, text), (2, ""), (3, "short")], "doc_id long, text string")
    got = chunk_documents(df, "doc_id", "text", chunk_chars=20, overlap=5).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_start"], r["chunk"]))
    # doc 1: step 15 -> starts 1,16,31,46 (floor((50-1)/15)=3 -> 4 chunks)
    assert [(c, s) for c, s, _ in sorted(by_doc[1])] == [(0, 1), (1, 16), (2, 31), (3, 46)]
    for c, s, chunk in sorted(by_doc[1]):
        assert chunk == text[s - 1:s - 1 + 20]
    # consecutive chunks overlap by exactly 5 chars
    chunks1 = [c for _, _, c in sorted(by_doc[1])]
    for a, b in zip(chunks1, chunks1[1:]):
        assert a[15:] == b[: len(a) - 15]
    assert by_doc[2] == [(0, 1, "")]
    assert by_doc[3] == [(0, 1, "short")]
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_chars=10, overlap=10)


def test_tokenize_ids_vocab_and_oov(spark):
    """Vocab ids rank by (freq desc, word asc); OOV maps to 0; positions are
    1-based over non-empty tokens."""
    from quatrain_mapreduce_spark.operators.curation import build_vocab, tokenize_ids

    df = spark.createDataFrame(
        [(1, "b a  a"), (2, "a c")], "doc_id long, text string"
    )
    vocab = build_vocab(df, "text", size=2)
    v = {r["word"]: r["token_id"] for r in vocab.collect()}
    assert v == {"a": 1, "b": 2}  # a freq 3; b and c tie at 1 -> b wins on word order
    got = {
        (r["doc_id"], r["tok_pos"]): (r["word"], r["token_id"])
        for r in tokenize_ids(df, "doc_id", "text", vocab).collect()
    }
    assert got == {
        (1, 1): ("b", 2), (1, 2): ("a", 1), (1, 3): ("a", 1),
        (2, 1): ("a", 1), (2, 2): ("c", 0),
    }


def test_adaptive_quality_filter_lower_median_per_group(spark):
    """No stopwords -> quality = 0.7*min(n/100,1). en lengths 10/20/30 give
    qualities .07/.14/.21; lower median (ceil(3/2)=2nd) = .14 -> the
    10-token doc is dropped. Singleton group keeps its only doc."""
    from quatrain_mapreduce_spark.operators.curation import adaptive_quality_filter

    rows = [
        (1, " ".join(["w"] * 10), "en"),
        (2, " ".join(["w"] * 20), "en"),
        (3, " ".join(["w"] * 30), "en"),
        (4, " ".join(["w"] * 5), "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in
           adaptive_quality_filter(df, "doc_id", "text", "lang").collect()}
    assert set(got) == {2, 3, 4}
    assert got[2]["thr_r"] == round(0.7 * 0.2, 4)
    assert got[4]["thr_r"] == got[4]["quality_r"] == round(0.7 * 0.05, 4)


def test_contamination_score_hand_example(spark):
    """Eval doc 'a b c d e' -> grams {abcd, bcde}. Train doc sharing one of
    its two grams scores 0.5; a disjoint doc scores 0.0."""
    from quatrain_mapreduce_spark.operators.curation import contamination_score

    df = spark.createDataFrame(
        [(1, "a b c d e"),            # eval
         (2, "a b c d x y z w"),      # grams: abcd(hit), bcdx, cdxy, dxyz, xyzw -> 1/5
         (3, "p q r s t")],           # disjoint -> 0/2
        "doc_id long, text string",
    )
    eval_ids = spark.createDataFrame([(1,)], "doc_id long")
    got = {r["doc_id"]: r for r in
           contamination_score(df, "doc_id", "text", eval_ids, n=4).collect()}
    assert set(got) == {2, 3}
    assert (got[2]["n_grams"], got[2]["n_hit"], got[2]["frac_r"]) == (5, 1, 0.2)
    assert (got[3]["n_grams"], got[3]["n_hit"], got[3]["frac_r"]) == (2, 0, 0.0)


def test_corpus_diff_statuses(spark):
    """added / removed / changed labeled correctly; unchanged dropped;
    whitespace-only edits are NOT changes (normalized fingerprint)."""
    from quatrain_mapreduce_spark.operators.curation import corpus_diff

    v1 = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will vanish"),
         (4, "ws   edit")],
        "doc_id long, text string",
    )
    v2 = spark.createDataFrame(
        [(1, "same text"), (2, "has changed"), (5, "brand new"),
         (4, "ws edit")],  # only whitespace collapsed -> same fingerprint
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(v1, v2, "doc_id", "text").collect()}
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_boilerplate_strip_removes_all_copies_including_first(spark, tmp_path):
    # span width 8: "b b b b b b b b" appears 3x within source s1 ->
    # ALL THREE copies go (the C4 rule), unlike dedup_spans' keep-first.
    # The same span appears once in source s2 -> kept (per-source rule).
    B = " ".join(["b"] * 8)
    U1 = " ".join(["u1"] * 8)
    U2 = " ".join(["u2"] * 8)
    rows = [
        (1, f"{B} {U1}", "en", "s1", 0),
        (2, f"{B} {U2}", "en", "s1", 0),
        (3, B, "en", "s1", 0),            # pure boilerplate -> doc drops
        (4, B, "en", "s2", 0),            # only copy in s2 -> kept
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    out = {r["doc_id"]: (r["text_clean"], r["n_spans_kept"])
           for r in all_queries()["boilerplate_strip"].fn(
               spark, str(tmp_path)).collect()}
    assert out == {1: (U1, 1), 2: (U2, 1), 4: (B, 1)}


def test_winnow_fingerprints_match_python_model(spark, tmp_path):
    import hashlib

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a a a a a a a a",                      # all-identical grams: ties
        "one two three four",                   # exactly 1 gram, 1 window?
        "short doc",                            # < 4 tokens -> no grams
        # md5("z67197 a b c")[:4] == "0000": a ZERO-hash gram, always the
        # window minimum — regression for the encoded-key decode, which
        # was off by one exactly at hv=0 (negative key under trunc div)
        "z67197 a b c d e f g",
    ]
    rows = [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    got = {r["doc_id"]: (r["n_grams"], r["n_fp"], r["fp_sum"], r["fp_min"])
           for r in all_queries()["winnow_fingerprints"].fn(
               spark, str(tmp_path)).collect()}

    def model(text, k=4, w=4):
        toks = [t for t in text.split(" ") if t]
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:4], 16)
              for g in grams]
        sel = set()
        for s in range(len(hs) - w + 1):
            win = hs[s:s + w]
            m = min(win)
            j = max(i for i in range(w) if win[i] == m)  # rightmost tie
            sel.add((s + j, hs[s + j]))
        return (len(grams), len(sel),
                sum(h for _, h in sel), min(h for _, h in sel))

    for doc_id, text in enumerate(texts, start=1):
        toks = [t for t in text.split(" ") if t]
        if len(toks) < 7:  # needs >= k + w - 1 tokens for one full window
            assert doc_id not in got
        else:
            assert got[doc_id] == model(text), text
    # density guarantee held implicitly: the all-ties doc selects the
    # rightmost position of every window, one fingerprint per window slide
    assert got[2][1] >= 1


def test_lexical_stats_hand_example(spark, tmp_path):
    rows = [
        (1, "a a b c", "en", "s", 0),     # en: tokens 4, types 3, hapax 2
        (2, "x x x x", "de", "s", 0),     # de: tokens 4, types 1, hapax 0
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    out = {r["lang"]: r for r in all_queries()["lexical_stats"].fn(
        spark, str(tmp_path)).collect()}
    en, de = out["en"], out["de"]
    assert (en["n_tokens"], en["n_types"], en["n_hapax"]) == (4, 3, 2)
    assert en["ttr_ppm"] == 750000 and en["hapax_ppm"] == 666666
    assert (de["n_tokens"], de["n_types"], de["n_hapax"]) == (4, 1, 0)
    assert de["ttr_ppm"] == 250000 and de["hapax_ppm"] == 0


def test_packing_efficiency_conserves_tokens_and_bounds_pad(spark, sf_dir):
    import pyspark.sql.functions as F
    from quatrain_mapreduce_spark.catalog import load_table
    from quatrain_mapreduce_spark.registry import all_queries

    rows = all_queries()["packing_efficiency"].fn(spark, sf_dir).collect()
    total = sum(r["n_tokens"] for r in rows)
    docs = load_table(spark, sf_dir, "documents")
    want = docs.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda x: x != "")))
        .alias("t")).collect()[0]["t"]
    assert total == want  # every token lands in exactly one shard
    for r in rows:
        assert 0 <= r["pad_tokens"] < 1024
        assert r["n_seqs"] * 1024 == r["n_tokens"] + r["pad_tokens"]


def test_decontaminate_incremental_probes_stored_state(spark, sf_dir):
    """The incremental contract: the executed plan must READ the staged
    base-pass artifacts (eval-gram index + survivor gram POSTING) rather
    than re-deriving them — and it must NOT re-tokenize the corpus: the
    only shingling in the probe plan is the eval increment's own, so the
    documents table is scanned exactly once (for the final lang rollup)
    plus once for the increment slice."""
    from quatrain_mapreduce_spark.registry import all_queries
    from quatrain_mapreduce_spark.staging import stage_dir

    df = all_queries()["decontaminate_incremental"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert stage_dir(sf_dir, "evalgram4") in plan
    assert stage_dir(sf_dir, "survpost4") in plan
    # the survivor id list is base-pass state only; the probe must not
    # rebuild the survivor grams from text (that was the 2.13 s-vs-1.78 s
    # re-shingle formulation, rejected at sf1 — see SCALING.md)
    assert stage_dir(sf_dir, "deconsurvivors4") not in plan


def test_weighted_systematic_sample_draw_invariants(spark, sf_dir):
    """Madow-sampling invariants no SQL oracle expresses directly:
    (1) total draws is EXACTLY k=100 (each of the k grid points lands in
    exactly one token interval); (2) any doc with weight >= T/k is
    guaranteed selection (its interval spans a full grid step); (3) the
    draw is deterministic across independent plan executions."""
    from quatrain_mapreduce_spark.registry import all_queries

    fn = all_queries()["weighted_sample_systematic"].fn
    rows = fn(spark, sf_dir).collect()
    assert sum(r["n_draws"] for r in rows) == 100

    import duckdb

    con = duckdb.connect()
    tot, big = con.execute(
        "WITH w AS ("
        "  SELECT CAST(len(list_filter(string_split(text,' '), x -> x <> ''))"
        "         AS BIGINT) AS n"
        f"  FROM read_parquet('{sf_dir}/documents.parquet'))"
        " SELECT (SELECT sum(n) FROM w),"
        "        (SELECT count(*) FROM w WHERE n * 100 >= (SELECT sum(n) FROM w))"
    ).fetchone()
    # every doc holding >= 1/k of the token mass must appear
    heavy_drawn = [r for r in rows if r["n_toks"] * 100 >= tot]
    assert len(heavy_drawn) == big

    again = fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
