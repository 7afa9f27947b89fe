"""Curation operators: decontamination, split leakage, sequence packing.

Oracles are hand-computed on tiny planted corpora; the contract queries in
__spark_entry__ carry the DuckDB hash-exact replay at sf0.01."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators.curation import (
    bench_bucket,
    contamination_rate,
    decontaminate,
    pack_shards,
    split_leakage,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_decontaminate_flags_only_ngram_overlap(spark):
    # bench doc shares a full 4-gram with d1; d2 shares only 3 tokens
    corpus = _docs(
        spark,
        [
            ("d1", "the quick brown fox jumps over"),
            ("d2", "quick brown fox sleeps all day long"),
            ("d3", "completely unrelated text about spark engines"),
        ],
    )
    bench = _docs(spark, [("b1", "lazy dogs and the quick brown fox jumps")])
    out = decontaminate(corpus, bench, "doc_id", "text", n=4).collect()
    assert {(r.id, r.bench_id) for r in out} == {("d1", "b1")}
    # d1 shares exactly two distinct 4-grams:
    # "the quick brown fox" and "quick brown fox jumps"
    assert out[0].n_shared == 2


def test_decontaminate_min_shared_threshold(spark):
    corpus = _docs(spark, [("d1", "a b c d e f")])
    bench = _docs(spark, [("b1", "a b c d z e f")])
    # shares one 4-gram ("a b c d") -> dropped at min_shared=2
    assert (
        decontaminate(corpus, bench, "doc_id", "text", n=4, min_shared=2).count()
        == 0
    )
    assert (
        decontaminate(corpus, bench, "doc_id", "text", n=4, min_shared=1).count()
        == 1
    )


def test_split_leakage_flags_cross_split_pairs_only(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "id_a string, id_b string"
    )
    splits = spark.createDataFrame(
        [("a", "train"), ("b", "train"), ("c", "val")],
        "doc_id string, split string",
    )
    out = split_leakage(pairs, splits, "doc_id").collect()
    got = {(r.id_a, r.id_b) for r in out}
    assert got == {("a", "c"), ("b", "c")}
    assert all(
        (r.split_a, r.split_b) in {("train", "val"), ("val", "train")}
        for r in out
    )


def test_pack_shards_offsets_are_exclusive_prefix_sums(spark):
    df = spark.createDataFrame(
        [(f"d{i}", 10 * (i + 1)) for i in range(20)], "doc_id string, n long"
    )
    out = pack_shards(df, "doc_id", F.col("n"), budget=50, n_shards=4)
    rows = out.collect()
    assert len(rows) == 20
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    # within each shard, offsets are an exclusive running sum starting at 0,
    # and pack_id is the 50-token chunk the first token lands in
    tok = {r.id: next(x.n for x in df.collect() if x.doc_id == r.id) for r in rows}
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.start_off)
        assert shard_rows[0].start_off == 0
        acc = 0
        for r in shard_rows:
            assert r.start_off == acc
            assert r.pack_id == acc // 50
            acc += tok[r.id]


def test_pack_shards_deterministic_under_repartition(spark):
    df = spark.createDataFrame(
        [(f"d{i}", i + 1) for i in range(50)], "doc_id string, n long"
    )
    a = pack_shards(df, "doc_id", F.col("n"), budget=16, n_shards=4)
    b = pack_shards(
        df.repartition(7), "doc_id", F.col("n"), budget=16, n_shards=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bench_bucket_partitions_and_contamination_rate(spark):
    docs = _docs(spark, [(f"d{i}", f"text {i}") for i in range(200)])
    is_bench = bench_bucket(F.col("doc_id"), 0.2)
    n_bench = docs.filter(is_bench).count()
    assert 0 < n_bench < 200
    assert docs.filter(~is_bench).count() == 200 - n_bench
    flagged = spark.createDataFrame(
        [("d1", "b1", 3), ("d1", "b2", 1), ("d2", "b1", 2)],
        "id string, bench_id string, n_shared long",
    )
    r = contamination_rate(flagged, docs, "doc_id").collect()[0]
    assert (r.n_docs, r.n_contaminated) == (200, 2)
    assert abs(r.rate - 2 / 200) < 1e-12
