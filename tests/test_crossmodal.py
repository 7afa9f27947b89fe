"""Cross-modal transcript↔audio consistency (operators/crossmodal.py).

Operator-level truth table over hand-planted quality/transcript frames
(the contract query owns the end-to-end decode path): every flag fires
exactly on its planted row, the threshold gap row fires nothing, NULL
transcripts count zero tokens, and the rate algebra matches a numpy
replay.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators.crossmodal import (
    transcript_audio_consistency,
)

N = 16384  # samples at 8 kHz → 2.048 s


def _run(spark, rows):
    """rows: (id, silence_ratio, transcript)."""
    quality = spark.createDataFrame(
        [(i, N, sr) for i, sr, _ in rows],
        "id long, n_samples long, silence_ratio double",
    )
    transcripts = spark.createDataFrame(
        [(i, t) for i, _, t in rows], "id long, transcript string"
    )
    out = transcript_audio_consistency(
        quality, transcripts, sr_hz=8000.0,
        min_tokens_per_s=2.0, max_tokens_per_s=60.0,
    )
    return {r.id: r for r in out.collect()}


def test_flag_truth_table(spark):
    text20 = " ".join(["word"] * 20)  # 20 tok / 2.048 s = 9.77 t/s: sane
    text200 = " ".join(["word"] * 200)  # 97.7 t/s: too fast
    got = _run(
        spark,
        [
            (0, 0.1, text20),    # clean speech+transcript
            (1, 1.0, text20),    # silent with transcript → flag
            (2, 1.0, ""),        # silence, no label: consistent
            (3, 0.1, ""),        # speech, empty → flag
            (4, 0.1, None),      # speech, NULL = 0 tokens → flag
            (5, 0.1, text200),   # rate too high → flag
            (6, 0.1, "ok"),      # 0.488 t/s, too slow → flag
            (7, 0.7, text200),   # threshold gap: neither silent nor speech
            (8, 1.0, None),      # silent + NULL: consistent
        ],
    )
    flags = {
        i: (
            r.silent_with_transcript,
            r.speech_with_empty_transcript,
            r.rate_outlier,
            r.consistent,
        )
        for i, r in got.items()
    }
    assert flags == {
        0: (False, False, False, True),
        1: (True, False, False, False),
        2: (False, False, False, True),
        3: (False, True, False, False),
        4: (False, True, False, False),
        5: (False, False, True, False),
        6: (False, False, True, False),
        7: (False, False, False, True),
        8: (False, False, False, True),
    }
    assert got[4].n_tokens == 0 and got[2].n_tokens == 0
    # single-division rate algebra: n_tokens * sr / n_samples, round 6
    assert got[0].tokens_per_s == round(20 * 8000.0 / N, 6)
    assert got[6].tokens_per_s == round(1 * 8000.0 / N, 6)


def test_inner_join_drops_undecodable(spark):
    """Clips absent from the quality frame (undecodable — the decode
    check owns them) produce no verdict row."""
    got = _run(spark, [(0, 0.1, "a b c d e f g h i j")])
    extra = spark.createDataFrame(
        [(99, "orphan transcript")], "id long, transcript string"
    )
    quality = spark.createDataFrame(
        [(0, N, 0.1)], "id long, n_samples long, silence_ratio double"
    )
    out = transcript_audio_consistency(quality, extra.union(
        spark.createDataFrame([(0, "a b c d e f g h i j")],
                              "id long, transcript string")))
    assert [r.id for r in out.collect()] == [0]
    assert set(got) == {0}


def test_token_count_sql_matches_ws_tokens(spark):
    """The suite DSL's TOKEN_COUNT_SQL and the crossmodal operator's
    ws_tokens must be the SAME tokenizer — including tab/newline
    separators, which the former's old space-only split miscounted."""
    from pyanomalydetector2_spark.constraints.dsl import TOKEN_COUNT_SQL
    from pyanomalydetector2_spark.operators.text import ws_tokens

    rows = [
        ("a", "hello world"),
        ("b", "hello\tworld"),
        ("c", "a\nb c"),
        ("d", "  padded  "),
        ("e", ""),
        ("f", None),
        ("g", "\t"),
        ("h", "one"),
        ("i", "x\r\ny  z"),
    ]
    df = spark.createDataFrame(rows, "id string, transcript string")
    t = F.col("transcript")
    got = {
        r["id"]: (r["sql_n"], r["op_n"])
        for r in df.select(
            "id",
            F.expr(TOKEN_COUNT_SQL).alias("sql_n"),
            F.when(t.isNull(), F.lit(0))
            .otherwise(F.size(ws_tokens(t)))
            .alias("op_n"),
        ).collect()
    }
    for rid, (sql_n, op_n) in got.items():
        assert sql_n == op_n, (rid, sql_n, op_n)
    assert got["b"] == (2, 2)   # tab separates
    assert got["g"] == (0, 0)   # whitespace-only counts zero
    assert got["i"] == (3, 3)   # CRLF + double space


def _mismatch_fixture(spark):
    from pyanomalydetector2_spark.operators.crossmodal import (
        dup_transcript_mismatch,
    )

    pairs = spark.createDataFrame(
        [(1, 2, 0.99), (1, 3, 0.97), (4, 5, 0.95), (6, 7, 0.93)],
        "id_a long, id_b long, sim double",
    )
    texts = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumps"),          # identical: dist 0
            (3, "the quick brown fox jumps ok"),       # +3 chars ≤ max_dist
            (4, "completely different transcript body here"),
            (5, "the quick brown fox jumps"),          # conflict: flag
            (6, None),                                 # NULL vs present
            (7, "a transcript someone did write"),
        ],
        "id long, transcript string",
    )
    return dup_transcript_mismatch, pairs, texts


def test_dup_transcript_mismatch_flags(spark):
    op, pairs, texts = _mismatch_fixture(spark)
    got = {(r.id_a, r.id_b): r for r in op(pairs, texts, max_dist=5).collect()}
    assert not got[(1, 2)].transcript_mismatch and got[(1, 2)].dist == 0
    assert not got[(1, 3)].transcript_mismatch and got[(1, 3)].dist == 3
    assert got[(4, 5)].transcript_mismatch          # real conflict
    assert got[(6, 7)].transcript_mismatch          # NULL label vs present
    # NULL compares as '': dist = len of the present side, rel_ppm = 1e6
    assert got[(6, 7)].dist == 30 and got[(6, 7)].rel_ppm == 1_000_000
    assert got[(1, 3)].rel_ppm == 3 * 1_000_000 // 28
    # sim rides through untouched
    assert got[(1, 2)].sim == 0.99


def test_dup_transcript_mismatch_bounded_kernel_same_flags(spark):
    """bounded=True (early-abandon thresholded levenshtein) must produce
    the IDENTICAL mismatch verdict set; dist degrades to the -1 sentinel
    (rel_ppm NULL) only on flagged pairs."""
    op, pairs, texts = _mismatch_fixture(spark)
    exact = {
        (r.id_a, r.id_b): r for r in op(pairs, texts, max_dist=5).collect()
    }
    bounded = {
        (r.id_a, r.id_b): r
        for r in op(pairs, texts, max_dist=5, bounded=True).collect()
    }
    assert set(exact) == set(bounded)
    for k, e in exact.items():
        b = bounded[k]
        assert b.transcript_mismatch == e.transcript_mismatch, k
        if e.transcript_mismatch:
            assert b.dist == -1 and b.rel_ppm is None, k
        else:
            assert (b.dist, b.rel_ppm) == (e.dist, e.rel_ppm), k


def test_dup_transcript_mismatch_missing_row_is_missing_label(spark):
    """A pair member with NO transcript row (not just NULL) must surface
    as a conflict against a present label — never silently drop the
    pair — and two absent labels agree (dist 0)."""
    from pyanomalydetector2_spark.operators.crossmodal import (
        dup_transcript_mismatch,
    )

    pairs = spark.createDataFrame(
        [(1, 2, 0.99), (3, 4, 0.98)], "id_a long, id_b long, sim double"
    )
    texts = spark.createDataFrame(
        [(1, "a label someone wrote")], "id long, transcript string"
    )  # ids 2, 3, 4 have no row at all
    got = {
        (r.id_a, r.id_b): r
        for r in dup_transcript_mismatch(pairs, texts, max_dist=5).collect()
    }
    assert set(got) == {(1, 2), (3, 4)}
    assert got[(1, 2)].transcript_mismatch and got[(1, 2)].dist == 21
    assert got[(1, 2)].len_b == 0
    assert not got[(3, 4)].transcript_mismatch and got[(3, 4)].dist == 0
