"""Structured Streaming audio ingest tests (streaming/audio_ingest.py).

Covers what the contract query can't: the quarantine gate (bad clips
never enter the index and are reported with the gate they hit), the
exactly-once pair accounting across micro-batches, and checkpointed
resume (new files continue from the stored index without re-ingesting
or re-pairing the old ones).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators import audio_fp as A
from pyanomalydetector2_spark.streaming.audio_ingest import (
    _read_state,
    compact_audio_index,
    ingest_audio_stream,
    ingest_summary,
    ingested_pairs,
    process_batch,
    quarantined,
    vacuum_audio_index,
)

DUR_MS = 2048  # every synth clip: 16384 samples @ 8000 Hz
SR_HZ = 8000


def _corpus(spark, lo: int, hi: int):
    ids = spark.range(lo, hi).withColumnRenamed("id", "doc_id")
    return A.synth_corpus(spark, ids).select(
        "clip_id",
        "bytes",
        "codec",
        F.lit(DUR_MS).alias("dur_ms"),
        F.lit(SR_HZ).alias("sr_hz"),
    )


def _one_shot_pairs(spark, lo: int, hi: int) -> dict:
    df = A.audio_near_dup(
        _corpus(spark, lo, hi), threshold=0.85, max_bucket_size=None
    )
    return {(r.id_a, r.id_b): r.sim for r in df.collect()}


def test_ingest_end_to_end_with_quarantine(spark, tmp_path):
    """Good clips pair exactly like the one-shot batch path; the junk
    clip and the duration-lying clip are quarantined with the right gate
    flags and contribute no pairs."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    good = _corpus(spark, 0, 24)

    pcm = A.synth_near_dup_pcm(np.array([0]))[0]
    wav_payload, wav_codec = A.encode_variant(pcm, 1)  # real WAV clip
    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "clip_id": [1000, 1001],
                "bytes": [b"definitely not audio", wav_payload],
                "codec": ["flac", wav_codec],
                "dur_ms": [DUR_MS, 9999],  # 1001 lies about duration
                "sr_hz": [SR_HZ, SR_HZ],
            }
        )
    ).select(
        F.col("clip_id").cast("long").alias("clip_id"),
        "bytes",
        "codec",
        F.col("dur_ms").cast("int").alias("dur_ms"),
        F.col("sr_hz").cast("int").alias("sr_hz"),
    )
    good.unionByName(bad).repartition(3).write.parquet(src)

    ingest_audio_stream(
        spark, src, state, threshold=0.85, max_bucket_size=None
    )

    q = {r.clip_id: r for r in quarantined(spark, state).collect()}
    assert set(q) == {1000, 1001}
    assert q[1000].probe_failed and not q[1000].dur_mismatch
    assert q[1001].dur_mismatch and not q[1001].probe_failed

    got_rows = ingested_pairs(spark, state).collect()
    got = {(r.id_a, r.id_b): r.sim for r in got_rows}
    assert len(got_rows) == len(got)  # each pair emitted exactly once
    assert got == _one_shot_pairs(spark, 0, 24) and got
    assert not any(1000 in k or 1001 in k for k in got)

    # the quarantined clips never reached the index either
    fp_ids = {
        r.id
        for r in spark.read.parquet(f"{state}/fp/batch=*").select("id").collect()
    }
    assert fp_ids == set(range(24))


def test_ingest_resume_is_incremental(spark, tmp_path):
    """A second invocation after new files arrive continues from the
    checkpoint: old batch outputs are untouched (same files, same pairs),
    only the new clips are fingerprinted, and the accumulated pair set
    equals the one-shot set over the whole corpus — cross-batch pairs
    found by probing the stored index, not by re-pairing old clips."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")

    cut = 17  # mid-group: group 5 = {15, 16, 17} straddles the cut
    _corpus(spark, 0, cut).repartition(2).write.parquet(src)
    ingest_audio_stream(
        spark, src, state, threshold=0.85, max_bucket_size=None
    )
    first_pairs = {
        (r.id_a, r.id_b): r.sim for r in ingested_pairs(spark, state).collect()
    }
    assert first_pairs == _one_shot_pairs(spark, 0, cut)
    first_batches = sorted(os.listdir(f"{state}/pairs"))
    first_mtimes = {
        d: os.stat(f"{state}/pairs/{d}").st_mtime_ns for d in first_batches
    }

    # clip 17 completes group 5 → guaranteed cross-batch near-dups
    # against already-indexed clips 15 and 16
    _corpus(spark, cut, 22).coalesce(1).write.mode("append").parquet(src)
    ingest_audio_stream(
        spark, src, state, threshold=0.85, max_bucket_size=None
    )

    later_batches = sorted(os.listdir(f"{state}/pairs"))
    assert len(later_batches) > len(first_batches)
    for d in first_batches:  # old batch dirs not rewritten
        assert os.stat(f"{state}/pairs/{d}").st_mtime_ns == first_mtimes[d]

    got = {
        (r.id_a, r.id_b): r.sim for r in ingested_pairs(spark, state).collect()
    }
    assert got == _one_shot_pairs(spark, 0, 22)
    cross = {k for k in got if k not in first_pairs and min(k) < cut <= max(k)}
    assert cross  # the stored index actually got probed


def _index_snapshot(spark, state):
    fp = {
        r.id: tuple(r.frames)
        for r in _read_state(
            spark, state, "fp", "id long, frames array<int>"
        ).collect()
    }
    bd = {
        (r.id, r.band, r.key)
        for r in _read_state(
            spark, state, "banded", "id long, band int, key int"
        ).collect()
    }
    return fp, bd


def test_compaction_preserves_state_and_resume(spark, tmp_path):
    """Folding the per-batch index deltas into a compacted generation and
    vacuuming the folded dirs changes NOTHING the readers see: resolved
    index content is identical, an incomplete (no _SUCCESS) generation is
    ignored, and a post-compaction ingest probing base + fresh deltas
    still reproduces the one-shot pair set."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    cut = 17
    _corpus(spark, 0, cut).repartition(3).write.parquet(src)
    ingest_audio_stream(
        spark, src, state, threshold=0.85, max_bucket_size=None
    )
    before = _index_snapshot(spark, state)
    assert set(before[0]) == set(range(cut))

    # a torn compaction (gen dir without _SUCCESS) must be invisible
    torn = f"{state}/fp_base/gen=99"
    os.makedirs(torn)
    with open(f"{torn}/garbage", "w") as f:
        f.write("not parquet")
    assert _index_snapshot(spark, state) == before
    import shutil

    shutil.rmtree(torn)

    folded = compact_audio_index(spark, state)
    assert folded == 2  # 3 source files → batches 0..2
    assert _index_snapshot(spark, state) == before
    # idempotent: nothing newer to fold
    assert compact_audio_index(spark, state) == folded

    removed = vacuum_audio_index(state)
    assert removed and not os.listdir(f"{state}/fp")
    assert _index_snapshot(spark, state) == before

    # resume after compaction: new clips probe the compacted base
    _corpus(spark, cut, 22).coalesce(1).write.mode("append").parquet(src)
    ingest_audio_stream(
        spark, src, state, threshold=0.85, max_bucket_size=None
    )
    got = {
        (r.id_a, r.id_b): r.sim for r in ingested_pairs(spark, state).collect()
    }
    assert got == _one_shot_pairs(spark, 0, 22)
    assert any(min(k) < cut <= max(k) for k in got)  # base was probed

    # auto-compaction knob: the new delta (batch=3) folds into gen=3
    # on the next drain once the threshold is met
    _corpus(spark, 22, 25).coalesce(1).write.mode("append").parquet(src)
    ingest_audio_stream(
        spark, src, state, threshold=0.85, max_bucket_size=None,
        compact_after=1,
    )
    assert _latest_gen_id(state) == 4
    assert not os.listdir(f"{state}/fp")
    got = {
        (r.id_a, r.id_b): r.sim for r in ingested_pairs(spark, state).collect()
    }
    assert got == _one_shot_pairs(spark, 0, 25)


def _latest_gen_id(state: str) -> int:
    from pyanomalydetector2_spark.streaming.audio_ingest import _latest_gen

    gen = _latest_gen(f"{state}/fp_base")
    return gen[0] if gen else -1


def test_crash_replay_restores_exact_state(spark, tmp_path):
    """The write-order invariant (pairs → fp → banded) under replay:
    whichever write a crash lands after, redelivering the batch rebuilds
    a state identical to a crash-free run — pairs are never lost, never
    duplicated, and the index never holds a batch whose pairs are
    missing. Drives process_batch directly (Structured Streaming's
    contract is exactly 'the same batch id is redelivered')."""
    import shutil

    state = str(tmp_path / "state")
    b0, b1 = _corpus(spark, 0, 9), _corpus(spark, 9, 17)
    process_batch(b0, 0, state, max_bucket_size=None)
    process_batch(b1, 1, state, max_bucket_size=None)
    want_pairs = {
        (r.id_a, r.id_b): r.sim for r in ingested_pairs(spark, state).collect()
    }
    assert want_pairs == _one_shot_pairs(spark, 0, 17)
    want_index = _index_snapshot(spark, state)

    # crash after pairs, before ANY index write: pairs survive the tear,
    # the index holds only batch 0 — replay rebuilds batch 1's index
    shutil.rmtree(f"{state}/fp/batch=1")
    shutil.rmtree(f"{state}/banded/batch=1")
    got = {
        (r.id_a, r.id_b): r.sim for r in ingested_pairs(spark, state).collect()
    }
    assert got == want_pairs  # invariant: no indexed batch without pairs
    process_batch(b1, 1, state, max_bucket_size=None)
    assert _index_snapshot(spark, state) == want_index
    assert {
        (r.id_a, r.id_b): r.sim for r in ingested_pairs(spark, state).collect()
    } == want_pairs

    # crash between the two index writes: fp present, bands missing —
    # the replay probes an index that already contains the batch's own
    # fingerprints, which must not change the emitted pairs AND must not
    # duplicate them (the member-frame dedup in the probe core — a dict
    # compare alone would hide duplicate rows)
    shutil.rmtree(f"{state}/banded/batch=1")
    process_batch(b1, 1, state, max_bucket_size=None)
    assert _index_snapshot(spark, state) == want_index
    replay_rows = ingested_pairs(spark, state).collect()
    assert len(replay_rows) == len(want_pairs)
    assert {
        (r.id_a, r.id_b): r.sim for r in replay_rows
    } == want_pairs


def test_fused_gate_fingerprints_matches_composed(spark):
    """ingest_gate_fingerprints (one Arrow pass over bytes) must agree
    row-for-row with the composed operators it fuses —
    with_consistency_fields gate flags AND audio_fingerprints frames —
    on a corpus mixing good clips, junk, a duration liar, an sr liar,
    and a container-consistent but fingerprint-short clip."""
    from pyanomalydetector2_spark.operators.audio import encode_wav
    from pyanomalydetector2_spark.operators.audio_fp import (
        audio_fingerprints,
        ingest_gate_fingerprints,
    )
    from pyanomalydetector2_spark.operators.multimodal import (
        with_consistency_fields,
    )

    good = _corpus(spark, 0, 12)
    pcm = A.synth_near_dup_pcm(np.array([1]))[0]
    wav_payload, _ = A.encode_variant(pcm, 1)
    short_wav = encode_wav(np.zeros(100, dtype=np.int16), SR_HZ)
    extra = spark.createDataFrame(
        pd.DataFrame(
            {
                "clip_id": [100, 101, 102, 103],
                "bytes": [b"junk", wav_payload, wav_payload, short_wav],
                "codec": ["flac", "wav", "wav", "wav"],
                "dur_ms": [DUR_MS, 9999, DUR_MS, 12],
                "sr_hz": [SR_HZ, SR_HZ, 16000, SR_HZ],
            }
        )
    ).select(
        F.col("clip_id").cast("long").alias("clip_id"),
        "bytes",
        "codec",
        F.col("dur_ms").cast("int").alias("dur_ms"),
        F.col("sr_hz").cast("int").alias("sr_hz"),
    )
    clips = good.unionByName(extra)

    fused = {r.id: r for r in ingest_gate_fingerprints(clips).collect()}
    assert set(fused) == set(range(12)) | {100, 101, 102, 103}

    gate = {r.clip_id: r for r in with_consistency_fields(clips).collect()}
    for cid, g in gate.items():
        f = fused[cid]
        assert f.probe_failed == (not g.container_probe_ok), cid
        assert f.dur_mismatch == (not g.container_dur_ok), cid
        assert f.sr_mismatch == (not g.container_sr_ok), cid
        assert f.container == g.container, cid

    ok_ids = {
        cid
        for cid, g in gate.items()
        if g.container_probe_ok and g.container_dur_ok and g.container_sr_ok
    }
    frames = {
        r.id: r.frames
        for r in audio_fingerprints(
            clips.filter(F.col("clip_id").isin(*ok_ids))
        ).collect()
    }
    for cid in fused:
        if cid in frames:
            assert fused[cid].frames == frames[cid], cid
        else:
            assert fused[cid].frames is None, cid
    assert fused[103].frames is None  # gate-ok but too short to fingerprint
    assert not fused[103].probe_failed and not fused[103].dur_mismatch


def test_ingest_summary(spark, tmp_path):
    """Per-batch metrics off the permanent outputs: pair counts and the
    quarantine breakdown by gate, zeros for quiet batches."""
    state = str(tmp_path / "state")
    process_batch(_corpus(spark, 0, 6), 0, state, max_bucket_size=None)

    pcm = A.synth_near_dup_pcm(np.array([0]))[0]
    wav_payload, wav_codec = A.encode_variant(pcm, 1)
    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "clip_id": [1000, 1001],
                "bytes": [b"junk", wav_payload],
                "codec": ["flac", wav_codec],
                "dur_ms": [2048, 9999],
                "sr_hz": [SR_HZ, SR_HZ],
            }
        )
    )
    process_batch(bad, 1, state, max_bucket_size=None)

    rows = {r.batch: r for r in ingest_summary(spark, state).collect()}
    assert set(rows) == {0, 1}
    n0 = len(_one_shot_pairs(spark, 0, 6))
    assert rows[0].n_pairs == n0 and rows[0].n_quarantined == 0
    assert rows[1].n_pairs == 0 and rows[1].n_quarantined == 2
    assert rows[1].n_probe_failed == 1 and rows[1].n_dur_mismatch == 1
    assert rows[1].n_sr_mismatch == 0


def test_compaction_never_folds_torn_batch_orphan(spark, tmp_path):
    """ADVICE r04 (medium): a crash between a batch's fp and banded
    writes leaves an orphan fp/batch=N+1 delta. Running the offline
    compaction before restart must NOT fold that orphan into the base —
    folded_thru is keyed on the newest *banded* delta, and folding the
    full resolved state would make the replayed fp/batch=N+1 delta a
    duplicate of rows already in the base, duplicating (id, frames) rows
    and every re-rank pair. The fix bounds the fold at folded_thru."""
    import shutil

    state = str(tmp_path / "state")
    b0, b1 = _corpus(spark, 0, 9), _corpus(spark, 9, 17)
    process_batch(b0, 0, state, max_bucket_size=None)
    process_batch(b1, 1, state, max_bucket_size=None)
    want_index = _index_snapshot(spark, state)
    want_pairs = {
        (r.id_a, r.id_b): r.sim for r in ingested_pairs(spark, state).collect()
    }

    # tear batch 1 between its fp and banded writes, then compact
    shutil.rmtree(f"{state}/banded/batch=1")
    folded = compact_audio_index(spark, state)
    assert folded == 0  # newest COMPLETE batch, not the torn one

    # the orphan's rows must not be in the compacted base
    base_ids = {
        r.id
        for r in spark.read.parquet(f"{state}/fp_base/gen=0").collect()
    }
    assert base_ids == set(range(9))
    # vacuum reclaims only folded deltas — the orphan survives for replay
    removed = vacuum_audio_index(state)
    assert not any("batch=1" in d for d in removed)

    # replay batch 1 (Structured Streaming redelivers the same id):
    # resolved state and pairs equal the crash-free run, no duplicates
    process_batch(b1, 1, state, max_bucket_size=None)
    assert _index_snapshot(spark, state) == want_index
    got_rows = ingested_pairs(spark, state).collect()
    got = {(r.id_a, r.id_b): r.sim for r in got_rows}
    assert len(got_rows) == len(got) and got == want_pairs

    # and a post-replay compaction now folds batch 1 cleanly
    assert compact_audio_index(spark, state) == 1
    vacuum_audio_index(state)
    assert _index_snapshot(spark, state) == want_index


def test_empty_state_readers_return_typed_empty_frames(spark, tmp_path):
    """ADVICE r04: before any batch lands, the reader entrypoints return
    empty frames with the production schema instead of raising a
    TypeError from spark.read.parquet() with zero paths."""
    state = str(tmp_path / "never_ingested")
    p = ingested_pairs(spark, state)
    assert p.columns == ["id_a", "id_b", "sim"] and p.count() == 0
    q = quarantined(spark, state)
    assert q.columns == [
        "clip_id", "codec", "container",
        "probe_failed", "dur_mismatch", "sr_mismatch",
    ]
    assert q.count() == 0
    s = ingest_summary(spark, state)
    assert s.columns == [
        "batch", "n_pairs", "n_quarantined",
        "n_probe_failed", "n_dur_mismatch", "n_sr_mismatch",
        "n_clips", "quarantine_rate", "secs_total",
        "secs_gate_fp", "secs_probe", "queue_lag_secs",
    ]
    assert s.count() == 0


def test_gate_quarantines_null_metadata_rows_not_the_batch(spark):
    """ADVICE r04: NULL declared dur_ms/sr_hz is missing evidence — the
    gate's vacuous-False contract (same as with_consistency_fields' SQL
    null semantics). One malformed row must not crash the whole Arrow
    batch; a decodable clip with null metadata still fingerprints."""
    pcm = A.synth_near_dup_pcm(np.array([0]))[0]
    wav_payload, wav_codec = A.encode_variant(pcm, 1)
    rows = spark.createDataFrame(
        pd.DataFrame(
            {
                "clip_id": pd.array([1, 2, 3], dtype="int64"),
                "bytes": [wav_payload, wav_payload, b"junk"],
                "codec": [wav_codec, wav_codec, "flac"],
                "dur_ms": pd.array([None, DUR_MS, None], dtype="Int32"),
                "sr_hz": pd.array([None, None, None], dtype="Int32"),
            }
        )
    )
    got = {
        r.id: r
        for r in A.ingest_gate_fingerprints(rows, dur_tol_ms=50).collect()
    }
    assert set(got) == {1, 2, 3}
    # null metadata => no mismatch evidence; WAV header carries sr, so
    # dur check for id=2 runs off the container rate and passes
    for cid in (1, 2):
        r = got[cid]
        assert not r.probe_failed and not r.dur_mismatch and not r.sr_mismatch
        assert r.frames is not None
    assert got[3].probe_failed and got[3].frames is None
    assert not got[3].dur_mismatch and not got[3].sr_mismatch


def test_ingest_ops_metrics_and_alarms(spark, tmp_path):
    """VERDICT r04 #7: per-batch ops metrics are durable and surfaced —
    a deliberately bigger batch is visibly slower in the summary's
    secs_total, queue lag is populated from the second batch on, and the
    quarantine-rate alarm fires exactly on the poisoned batch (the
    reference's alarm-funnel shape: thresholds in, tiny dict out)."""
    from pyanomalydetector2_spark.streaming.audio_ingest import (
        ingest_alarms,
    )

    state = str(tmp_path / "state")
    # batch 0 doubles as warm-up: it pays Python-worker/codegen cold start
    # (measured ~3x a warm batch), so wall comparisons use later batches
    process_batch(_corpus(spark, 0, 6), 0, state, max_bucket_size=None)
    # batch 1: ~65x the decode work of the (warm) bad batch — the planted
    # slow batch. Sized so the decode-phase delta (seconds) clears the
    # per-batch fixed scheduling jitter by an order of magnitude.
    process_batch(_corpus(spark, 6, 200), 1, state, max_bucket_size=None)

    pcm = A.synth_near_dup_pcm(np.array([0]))[0]
    wav_payload, wav_codec = A.encode_variant(pcm, 1)
    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "clip_id": [1000, 1001, 1002],
                "bytes": [b"junk", b"junk2", wav_payload],
                "codec": ["flac", "flac", wav_codec],
                "dur_ms": [2048, 2048, 2048],
                "sr_hz": [SR_HZ, SR_HZ, SR_HZ],
            }
        )
    )
    process_batch(bad, 2, state, max_bucket_size=None)

    rows = {r.batch: r for r in ingest_summary(spark, state).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].n_clips == 6 and rows[1].n_clips == 194
    # the planted big batch is visible in the metrics — compared against
    # the other WARM batch (batch 0 absorbed cold start), on the
    # compute-bound decode phase AND the total wall
    assert rows[1].secs_gate_fp > rows[2].secs_gate_fp
    assert rows[1].secs_total > rows[2].secs_total
    assert rows[0].queue_lag_secs is None  # no predecessor
    assert rows[1].queue_lag_secs is not None
    assert rows[2].quarantine_rate == round(2 / 3, 6)
    assert rows[0].quarantine_rate == 0.0

    alarms = ingest_alarms(spark, state, max_quarantine_rate=0.05)
    assert list(alarms) == ["batch_2"]
    assert alarms["batch_2"]["reasons"] == ["quarantine_rate"]
    assert alarms["batch_2"]["n_quarantined"] == 2

    # slow-batch threshold between the two warm batches' walls: the big
    # batch must join the report as slow_batch
    thr = (rows[2].secs_total + rows[1].secs_total) / 2
    alarms2 = ingest_alarms(
        spark, state, max_quarantine_rate=0.05, max_batch_secs=thr
    )
    assert "batch_1" in alarms2 and "slow_batch" in alarms2["batch_1"]["reasons"]
