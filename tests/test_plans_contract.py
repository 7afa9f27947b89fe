"""Plan-regression gate over the most expensive contract queries
(VERDICT r02 next-round #6): the assertions tools/plan_audit.py used to
check by hand now fail CI when a plan regresses — a global sort sneaking
into a pipeline, a join degrading to cartesian, a time filter no longer
reaching the parquet scan, a broadcast turning into a shuffled join.

Runs at sf0.001 (plan SHAPE is scale-invariant for these checks; AQE is
finalized by executing each query, which is milliseconds at this SF).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as ent
from pyanomalydetector2_spark.plans import audit_plan

SF = "/root/testdata/sf0.001"


def _audit(spark, name):
    return audit_plan(ent.queries()[name](spark, SF))


# the bench's most expensive pipelines: any global sort or cartesian here
# is a regression (their r02-audited shapes have neither)
HEAVY = [
    "dedup_keep_best",
    "dup_clusters",
    "near_dup_incremental",
    "embedding_near_dup",
    "drift_psi",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "embedding_near_dup_lsh",
    "audio_near_dup",
    "audio_near_dup_incremental",
    "audio_dup_clusters",
    "audio_keep_best",
    "audio_dup_transcript_mismatch",
    "audio_embed_near_dup",
    "audio_quality_drift",
    "vocab_drift",
]


@pytest.mark.parametrize("name", HEAVY)
def test_heavy_queries_no_global_sort_no_cartesian(spark, name):
    a = _audit(spark, name)
    assert a["sorts_global"] == 0, f"{name}: global sort crept in"
    assert a["cartesian"] == 0, f"{name}: shuffle cartesian crept in"
    # broadcast nested-loop joins are allowed ONLY for the tiny-literal
    # grids that want them (drift_psi's static bin grid)
    # (vocab_drift's is the ≤ k+1-row broadcast category grid of the
    # shared categorical-drift machinery)
    allowed_bnlj = {
        "drift_psi": 1,
        "audio_quality_drift": 1,
        "vocab_drift": 1,
    }.get(name, 0)
    assert a["bnlj"] <= allowed_bnlj, f"{name}: unexpected nested-loop join"


def test_zscore_screen_pushes_time_filter(spark):
    """The detect screen's time-range predicate must reach the parquet
    scan (PushedFilters) and the scan must stay column-pruned."""
    a = _audit(spark, "zscore_screen")
    assert any("ts" in p or "clock" in p for p in a["pushed"]), (
        f"time filter not pushed: {a['pushed']}"
    )
    assert a["scan_cols"] and max(a["scan_cols"]) <= 4, (
        f"scan reads too many columns: {a['scan_cols']}"
    )


def test_star_join_broadcasts_dims(spark):
    """The metadata star join must broadcast its dimension sides, not
    shuffle them."""
    a = _audit(spark, "star_join_agg")
    assert a["broadcasts"] >= 1, "star join lost its broadcast"


def test_drift_psi_shape(spark):
    """drift_psi: fully distributed (two column-pruned scans, broadcast
    grid/baseline, fixed-order running window) — bounded shuffles, no
    driver funnel, no global sort."""
    a = _audit(spark, "drift_psi")
    assert a["broadcasts"] >= 1
    assert a["shuffles"] <= 5, f"shuffle blowup: {a['shuffles']}"


def test_ann_paths_stay_bucketed(spark):
    """ANN queries must keep the bucket/cell join shuffled-or-broadcast on
    the join key — a cartesian there means the candidate pruning is gone.
    (brute-force embedding_topk is the one INTENTIONAL cross join and is
    excluded by design.)"""
    for name in ("ann_lsh_topk", "ann_ivf_topk", "ann_ivf_index_topk",
                 "ann_ivf_pq_topk"):
        a = _audit(spark, name)
        assert a["cartesian"] == 0, f"{name}: bucket join degraded to cartesian"
        assert a["bnlj"] == 0, f"{name}: bucket join degraded to nested loop"
        assert a["sorts_global"] == 0, f"{name}: global sort crept in"


def test_incremental_probe_core_shape(spark):
    """The fused incremental probe (BENCH/BASELINE.md §10): ONE flagged
    aggregation builds both bucket member arrays, so the probe plan must
    contain at most one aggregation exchange chain — bounded shuffles
    overall — and the broadcast-prune variant must actually broadcast.
    Guards the r04-close rebuild against regressing to the
    aggregate-twice-and-join shape (which showed up as two extra
    batch-sized shuffles per micro-batch)."""
    from pyspark.sql import functions as F

    from pyanomalydetector2_spark.operators.dedup import (
        incremental_pairs_from_banded,
    )
    from pyanomalydetector2_spark.plans import audit_plan

    banded = spark.range(400).select(
        F.col("id"),
        (F.col("id") % 13).cast("int").alias("band"),
        (F.col("id") % 7).cast("int").alias("key"),
    )
    index_b = banded.filter(F.col("id") >= 100).localCheckpoint()
    new_b = banded.filter(F.col("id") < 100).localCheckpoint()

    # no-prune: union -> hot-count -> anti -> collect -> explode/distinct
    a = audit_plan(
        incremental_pairs_from_banded(index_b, new_b, 10_000, prune=False)
    )
    assert a["sorts_global"] == 0 and a["cartesian"] == 0
    assert a["shuffles"] <= 4, f"no-prune probe shuffle blowup: {a['shuffles']}"

    # broadcast prune: same plus the key semi, which must be a broadcast
    # (the index side stays at one scan, never index-wide shuffled)
    b = audit_plan(
        incremental_pairs_from_banded(
            index_b, new_b, 10_000, broadcast_keys=True, prune=True
        )
    )
    assert b["sorts_global"] == 0 and b["cartesian"] == 0
    assert b["broadcasts"] >= 1, "key prune lost its broadcast"
    assert b["shuffles"] <= 6, f"pruned probe shuffle blowup: {b['shuffles']}"


def test_kll_quantiles_shuffle_budget(spark):
    """The sketch build's scale claim in plan form: partials are built
    map-side (mapInPandas, no exchange), so the whole kll_quantiles
    pipeline carries at most the one sketch-rows merge exchange plus the
    input cap's window shuffle — and never a global sort of the data."""
    a = _audit(spark, "kll_quantiles")
    assert a["shuffles"] <= 3, f"kll shuffle blowup: {a['shuffles']}"
    assert a["cartesian"] == 0


def test_snippet_search_broadcasts_queries(spark):
    """snippet_search's scale contract: the corpus' exploded pair keys
    must meet the query keys in a BROADCAST join (the corpus side never
    shuffles before the match), the only hash exchanges are the
    offset-groupBy aggregation chains, and no global sort or cartesian
    appears. exact_substring_dup: bounded shuffles, no global sort."""
    a = _audit(spark, "audio_snippet_search")
    assert a["broadcasts"] >= 2, "query keys / n_keys not broadcast"
    assert a["cartesian"] == 0 and a["bnlj"] == 0
    assert a["sorts_global"] == 0
    # budget 3: ONE offset-groupBy aggregation exchange on the corpus
    # path + the snippet-synth rebalance appearing once per broadcast
    # subtree (sk and n_keys) — both on the tiny query side. Anything
    # more means the corpus' exploded keys started shuffling.
    assert a["shuffles"] <= 3, f"snippet match shuffle blowup: {a['shuffles']}"

    b = _audit(spark, "exact_substring_dup")
    assert b["sorts_global"] == 0 and b["cartesian"] == 0
    assert b["shuffles"] <= 5, f"exact_substring_dup shuffles: {b['shuffles']}"


def test_vocab_topk_no_global_sort(spark):
    """Top-k compiles to TakeOrderedAndProject (per-partition heaps + a
    k-row driver merge) — never a rangepartitioning sort shuffle of the
    vocabulary."""
    a = _audit(spark, "vocab_topk")
    assert a["sorts_global"] == 0, "vocab top-k planned a global sort"


def test_oov_rate_broadcasts_vocab(spark):
    """The reference vocabulary joins broadcast (10^4-row vocab vs a
    10^12-token probe side — a shuffled join would move the corpus)."""
    a = _audit(spark, "oov_rate")
    assert a["broadcasts"] >= 1, "vocab join lost its broadcast"
    assert a["sorts_global"] == 0
