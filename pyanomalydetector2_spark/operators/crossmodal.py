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
