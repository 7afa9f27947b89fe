"""Cross-modal transcript ↔ audio consistency checks.

The north-rule table is clip + transcript PAIRS, yet every other check
validates one modality at a time (``audio_fp.audio_quality`` for the
signal, ``text.token_metrics`` for the transcript). A real speech-corpus
pipeline runs the cross checks on every row:

- **silent clip with a non-empty transcript** — the label claims speech
  the audio does not contain (mislabeled or truncated upload);
- **speech with an empty/null transcript** — audio content with no
  label (dropped transcription job);
- **speaking-rate outlier** — transcript token count implausible for
  the clip's duration (wrong pairing, duplicated text, wrong units).

Everything here is a pure Column-expression composition over frames the
pipeline has ALREADY computed — the fused Arrow decode pass's quality
metrics (silence_ratio, n_samples) and the transcript column — so the
checks add zero decode passes and zero Python. The only data movement is
one id-to-id join between the quality frame and the transcript frame; in
the production table (transcript is a COLUMN of the clips row) even that
join disappears because ``audio_quality`` and the transcript ride the
same scan.

Reference analog for the shape: the declarative per-item condition
template (/root/reference/detectors/detector.py:169-185, the
``_evaluate_cond`` conjunctions) — a per-row verdict from threshold
predicates, here spanning two modalities of the same row. Same funnel as
``multimodal.audio_container_consistency``.

Scale shape at 10^12 rows: the flags are codegen'd column expressions;
the join is id-equi (sort-merge, or colocated/zero when both sides come
off the same row as in the suite wiring); nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators.text import ws_tokens

# a clip is "silent" when ≥ this share of samples sits below 1 % full
# scale, "speech" when ≤ speech_max does; the gap makes both labels
# robust to threshold-adjacent rows (a clip in the gap gets neither)
SILENCE_MIN = 0.99
SPEECH_MAX = 0.5


def transcript_audio_consistency(
    quality_df: DataFrame,
    transcripts_df: DataFrame,
    sr_hz: float = 8000.0,
    silence_min: float = SILENCE_MIN,
    speech_max: float = SPEECH_MAX,
    min_tokens_per_s: float = 2.0,
    max_tokens_per_s: float = 60.0,
    id_col: str = "id",
    transcript_col: str = "transcript",
) -> DataFrame:
    """Per-pair cross-modal consistency verdicts.

    ``quality_df``: the ``audio_fp.audio_quality`` output (id, n_samples,
    silence_ratio, …) — the already-computed fused Arrow pass; this
    function never touches ``bytes``. ``transcripts_df``: (id, transcript).
    ``sr_hz``: sample rate turning decoded n_samples into duration; pass
    the corpus rate, or pre-join a per-row rate and divide upstream.

    Returns one row per decodable pair:
    (id, n_tokens, silence_ratio, tokens_per_s,
     silent_with_transcript, speech_with_empty_transcript, rate_outlier,
     consistent) — booleans define the violation funnel, ``consistent``
    is their NOR. NULL transcripts count 0 tokens (missing label, same
    bucket as empty). ``tokens_per_s`` = round(n_tokens·sr / n_samples, 6)
    — single-division algebra so a DuckDB replay is bit-identical — and
    the outlier comparison reads the ROUNDED value on both sides.
    Rate outliers are judged only on speech rows that have a transcript:
    silence and emptiness already have their own flags, and a rate over
    dead air is noise, not evidence."""
    t = F.col(transcript_col)
    n_tokens = F.when(t.isNull(), F.lit(0)).otherwise(F.size(ws_tokens(t)))
    pairs = quality_df.select(
        "id", "n_samples", "silence_ratio"
    ).join(
        transcripts_df.select(
            F.col(id_col).alias("id"), t.alias(transcript_col)
        ),
        "id",
    )
    out = pairs.select(
        "id",
        n_tokens.cast("int").alias("n_tokens"),
        F.round("silence_ratio", 6).alias("silence_ratio"),
        "n_samples",
    )
    rate = F.round(
        F.col("n_tokens") * F.lit(float(sr_hz)) / F.col("n_samples"), 6
    )
    is_silent = F.col("silence_ratio") >= F.lit(float(silence_min))
    is_speech = F.col("silence_ratio") <= F.lit(float(speech_max))
    silent_wt = is_silent & (F.col("n_tokens") >= 1)
    speech_et = is_speech & (F.col("n_tokens") == 0)
    rate_out = (
        is_speech
        & (F.col("n_tokens") >= 1)
        & (
            (rate < F.lit(float(min_tokens_per_s)))
            | (rate > F.lit(float(max_tokens_per_s)))
        )
    )
    return out.select(
        F.col("id"),
        "n_tokens",
        "silence_ratio",
        rate.alias("tokens_per_s"),
        silent_wt.alias("silent_with_transcript"),
        speech_et.alias("speech_with_empty_transcript"),
        rate_out.alias("rate_outlier"),
        (~(silent_wt | speech_et | rate_out)).alias("consistent"),
    )


def dup_transcript_mismatch(
    pairs_df: DataFrame,
    transcripts_df: DataFrame,
    id_col: str = "id",
    transcript_col: str = "transcript",
    max_dist: int = 5,
    bounded: bool = False,
) -> DataFrame:
    """Label-consistency check over audio-duplicate pairs: the SAME
    recording carrying two materially different transcripts is a labeling
    defect no single-modality check can see — the audio checks say both
    clips are fine, the text checks say both transcripts are fine, and the
    near-dup pass says they are one recording. A speech corpus keeps at
    most one of those labels; this check finds the conflicts.

    ``pairs_df``: confirmed audio near-dup pairs (id_a, id_b, sim) — the
    output of ``audio_fp.audio_near_dup`` (or the incremental / streaming
    probe, which shares the schema). ``transcripts_df``: (id, transcript).
    NULL transcripts — and ids with no transcript row at all (LEFT
    joins, so an absent label can never silently drop the pair) —
    compare as '': a missing label conflicts with a present one, same
    bucket as ``transcript_audio_consistency``'s token-count rule.

    Output: (id_a, id_b, sim, len_a, len_b, dist, rel_ppm,
    transcript_mismatch) where ``dist`` is the Levenshtein distance
    between the raw transcripts, ``rel_ppm`` =
    floor(1e6 · dist / max(len_a, len_b, 1)) — an exact BIGINT ratio, so
    a SQL replay needs no float-rounding convention — and
    ``transcript_mismatch`` = dist > max_dist.

    Scale shape: the transcript frame reaches the pair frame through two
    id-equi hash joins, both candidate-bounded (pairs ≪ corpus — the same
    argument as ``dedup.edit_near_dup``); the distance kernel is Spark's
    JVM ``levenshtein``. With ``bounded=True`` the thresholded
    ``levenshtein(a, b, max_dist)`` kernel runs instead — early-abandon
    DP, O(max_dist·min_len) per pair — and ``dist`` reports -1 for
    over-threshold pairs (the flag is identical; pytest pins it). Use
    bounded on production drains where transcripts are long and only the
    verdict matters; exact when the distance itself is the deliverable.

    Reference analog: none (the reference is single-modality); this is
    the cross-modal completion of its duplicate-handling funnel
    (detector.py's per-item verdicts → per-pair verdicts)."""
    t = F.coalesce(F.col(transcript_col), F.lit(""))
    texts = transcripts_df.select(
        F.col(id_col).alias("__id"),
        t.alias("__t"),
        F.length(t).alias("__len"),
    )
    j = (
        pairs_df.select("id_a", "id_b", "sim")
        .join(
            texts.select(
                F.col("__id").alias("id_a"),
                F.col("__t").alias("__t_a"),
                F.col("__len").alias("len_a"),
            ),
            "id_a",
            "left",
        )
        .join(
            texts.select(
                F.col("__id").alias("id_b"),
                F.col("__t").alias("__t_b"),
                F.col("__len").alias("len_b"),
            ),
            "id_b",
            "left",
        )
        .select(
            "id_a",
            "id_b",
            "sim",
            F.coalesce(F.col("__t_a"), F.lit("")).alias("__t_a"),
            F.coalesce(F.col("__t_b"), F.lit("")).alias("__t_b"),
            F.coalesce(F.col("len_a"), F.lit(0)).alias("len_a"),
            F.coalesce(F.col("len_b"), F.lit(0)).alias("len_b"),
        )
    )
    # equality shortcut on BOTH kernels: duplicate pairs overwhelmingly
    # carry the SAME transcript (that is the ground truth the check rides
    # on), and levenshtein(x, x) = 0 exactly — skipping the O(len²) DP for
    # equal strings removes the dominant per-pair cost without changing a
    # single distance
    eq = F.col("__t_a") == F.col("__t_b")
    if bounded:
        dist = F.when(eq, F.lit(0)).otherwise(
            F.levenshtein(F.col("__t_a"), F.col("__t_b"), max_dist)
        )
        mism = dist == -1
    else:
        dist = F.when(eq, F.lit(0)).otherwise(
            F.levenshtein(F.col("__t_a"), F.col("__t_b"))
        )
        mism = dist > max_dist
    longest = F.greatest(F.col("len_a"), F.col("len_b"), F.lit(1))
    rel = F.when(
        dist >= 0,
        F.floor(dist.cast("long") * F.lit(1_000_000) / longest).cast("long"),
    )  # long math before the multiply (int32 would overflow past dist≈2147);
    # NULL for a bounded kernel's -1 sentinel — there is no distance
    return j.select(
        "id_a",
        "id_b",
        "sim",
        "len_a",
        "len_b",
        dist.cast("int").alias("dist"),
        rel.alias("rel_ppm"),
        mism.alias("transcript_mismatch"),
    )
