"""Mechanical enforcement of the rows-only differential manifest.

13 registered queries carry no DuckDB oracle by construction (engine-
specific hash families, float codebooks, iterative fixpoints) — the driver
records only a rows-present check for them, so their REAL correctness gates
are differential/property pytests against exact twins, Python reference
models, or recall/precision bounds. Until r11 that linkage was convention;
this test makes it mechanical (VERDICT r10 directive #5): every
``oracle=None`` registry entry must name its gates here, every named gate
must still exist as a collectable test function, and every named oracled
twin must still be registered WITH an oracle — so deleting or renaming a
differential gate turns CI red instead of silently weakening the rows-only
tier to "it returned some rows".
"""

from __future__ import annotations

import os
import re

from quatrain_mapreduce_spark.registry import all_queries

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))

# rows-only query -> its correctness gates.
#   "tests": pytest functions (file::function) asserting a differential /
#            parity / recall / precision / plan property for this query's
#            operator path;
#   "twin":  optionally, a REGISTERED ORACLED query that exercises the same
#            operator with accuracy pinned by the driver's value hash.
MANIFEST: dict[str, dict] = {
    "profile_orders_hll": {
        # accuracy driver-gated via the twin's dist_ok oracle; the plan
        # property (Expand-free sketch aggregation) pytest-gated
        "twin": "profile_orders_approx",
        "tests": ["test_profiling.py::test_profile_table_approx_has_no_expand"],
    },
    "dedup_minhash_lsh": {
        "tests": [
            "test_dedup.py::test_minhash_covers_ngram_ground_truth",
            "test_dedup.py::test_minhash_jaccard_estimates_match_exact",
        ],
    },
    "dedup_simhash": {
        "tests": ["test_dedup.py::test_simhash_finds_near_identical"],
    },
    "similarity_lsh": {
        "tests": ["test_similarity.py::test_lsh_recall_vs_brute_force"],
    },
    "similarity_ivf": {
        "tests": [
            "test_similarity.py::test_ivf_exact_when_probing_all_lists",
            "test_similarity.py::test_ivf_recall_vs_brute_force",
        ],
    },
    "similarity_pq": {
        "tests": ["test_similarity.py::test_pq_cluster_precision_vs_brute_force"],
    },
    "similarity_ivfpq": {
        "tests": ["test_similarity.py::test_ivfpq_cluster_precision_and_pruning"],
    },
    "bpe_train_merges": {
        "tests": ["test_text_multimodal.py::test_bpe_train_matches_pure_python_reference"],
    },
    "bpe_encode_corpus": {
        "tests": ["test_text_multimodal.py::test_bpe_apply_roundtrips_training_segmentation"],
    },
    "embedding_pca_project": {
        "tests": ["test_similarity.py::test_pca_matches_numpy_reference"],
    },
    "hybrid_search_rrf_ivf": {
        "twin": "hybrid_search_rrf",
        "tests": ["test_similarity.py::test_hybrid_rrf_ivf_tracks_the_exact_twin"],
    },
    "k_core_members": {
        "tests": ["test_profiling.py::test_k_core_hand_graph_and_python_parity"],
    },
    "lpa_communities": {
        "tests": ["test_graph_cdc.py::test_lpa_matches_python_model"],
    },
}


def test_every_rows_only_query_has_a_manifest_entry():
    """Both directions: a NEW oracle-less query must land with a gate named
    here, and a deregistered one must not leave a stale entry."""
    qs = all_queries()
    rows_only = {n for n, q in qs.items() if not q.oracle}
    assert rows_only == set(MANIFEST), (
        f"rows-only registry vs manifest drift: "
        f"unmanifested={sorted(rows_only - set(MANIFEST))} "
        f"stale={sorted(set(MANIFEST) - rows_only)}"
    )


def test_every_manifest_gate_still_exists():
    """Each named pytest must still be a collectable function in its file —
    renaming or deleting a differential gate fails HERE, not silently."""
    missing = []
    for name, entry in MANIFEST.items():
        assert entry.get("tests"), f"{name}: manifest entry names no tests"
        for ref in entry["tests"]:
            fname, _, func = ref.partition("::")
            path = os.path.join(_TESTS_DIR, fname)
            if not os.path.isfile(path):
                missing.append(f"{name}: file {fname} missing")
                continue
            with open(path) as fh:
                if not re.search(rf"^def {re.escape(func)}\(", fh.read(), re.M):
                    missing.append(f"{name}: {ref} not found")
    assert not missing, missing


def test_every_manifest_twin_is_registered_and_oracled():
    qs = all_queries()
    for name, entry in MANIFEST.items():
        twin = entry.get("twin")
        if twin is None:
            continue
        assert twin in qs, f"{name}: twin {twin} not registered"
        assert qs[twin].oracle, f"{name}: twin {twin} has no oracle"
