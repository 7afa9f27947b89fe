"""Multimodal (audio) row invariants — Arrow-batched pandas UDFs.

The north_rule per-row invariant: decoded PCM must match the reference decode
with SNR ≥ 30 dB, and the transcript must equal the reference transcript.
Both are recomputable from the clip_id (datagen.clips derives everything from
the numeric id), so the check is self-contained.

Execution model (input_hint: "vectorized pandas/Arrow UDFs, no per-row
Python" at the *engine* level): the binary column crosses the JVM→Python
boundary once per Arrow batch; numpy does the decode + SNR math. Column
pruning keeps the ``bytes`` column out of every other operator's scan
(SURVEY §4 — the profile/uniqueness/drift passes never touch it).

Codec handling: ``pcm_s16le`` decodes for real (int16 LE → float). The other
codecs in the dim table (flac/opus/mp3) carry a 4-byte magic tag over the
same PCM — a clearly-marked deterministic fake (codec libraries are not in
this container; see datagen.clips docstring). ``decode_pcm_batch`` is the
single seam where a real codec library would plug in. Unknown codecs →
decode failure (decode_ok=false), which the suite surfaces as a violation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from pyanomalydetector2_spark.datagen.clips import (
    CODEC_MAGIC,
    PCM_SAMPLES,
    reference_pcm,
    reference_transcript,
)

SNR_CAP_DB = 999.0


def decode_pcm_batch(payload: bytes | None, codec: str | None) -> np.ndarray | None:
    """Decode one clip payload → float64 waveform, or None if undecodable.

    REAL path: pcm_s16le. FAKE-but-deterministic path: known magic-tagged
    codecs (strip tag, decode as PCM). A production build replaces this body
    with pyav/soundfile — the UDF plumbing around it is unchanged.
    """
    if payload is None or codec is None:
        return None
    if codec == "pcm_s16le":
        raw = payload
    else:
        magic = CODEC_MAGIC.get(codec)
        if magic is None or not payload.startswith(magic):
            return None  # unknown codec / corrupt container
        raw = payload[len(magic):]
    if len(raw) < 2 * PCM_SAMPLES:
        return None
    return np.frombuffer(raw[: 2 * PCM_SAMPLES], dtype="<i2").astype(np.float64)


def snr_db(decoded: np.ndarray, reference: np.ndarray) -> float:
    err = decoded - reference
    pe = float(np.sum(err * err))
    ps = float(np.sum(reference * reference))
    if pe == 0.0:
        return SNR_CAP_DB
    if ps == 0.0:
        return 0.0
    return min(10.0 * np.log10(ps / pe), SNR_CAP_DB)


_INV_TYPE = T.StructType(
    [
        T.StructField("snr", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("transcript_ok", T.BooleanType()),
    ]
)


@pandas_udf(_INV_TYPE)
def audio_invariants(
    clip_id: pd.Series, payload: pd.Series, codec: pd.Series, transcript: pd.Series
) -> pd.DataFrame:
    """Arrow-batched invariant kernel. numpy per clip inside the batch; the
    per-clip loop is the decode itself (inherently per-payload), everything
    else is vectorized."""
    n = len(clip_id)
    snrs = np.full(n, np.nan)
    dec_ok = np.zeros(n, dtype=bool)
    t_ok = np.zeros(n, dtype=bool)
    for i in range(n):
        cid = clip_id.iat[i]
        if cid is None:
            continue
        try:
            num = int(cid.rsplit("-", 1)[1])
        except (ValueError, IndexError):
            continue
        dec = decode_pcm_batch(payload.iat[i], codec.iat[i])
        if dec is not None:
            dec_ok[i] = True
            snrs[i] = snr_db(dec, reference_pcm(num))
        t = transcript.iat[i]
        t_ok[i] = t is not None and t == reference_transcript(num)
    return pd.DataFrame({"snr": snrs, "decode_ok": dec_ok, "transcript_ok": t_ok})


def with_audio_invariants(clips: DataFrame) -> DataFrame:
    """Project ONLY the needed columns (bytes stays out of all other scans),
    attach the invariant struct."""
    inv = audio_invariants("clip_id", "bytes", "codec", "transcript")
    return clips.withColumn("_inv", inv).select(
        *[c for c in clips.columns if c != "bytes"],
        F.col("_inv.snr").alias("snr"),
        F.col("_inv.decode_ok").alias("decode_ok"),
        F.col("_inv.transcript_ok").alias("transcript_ok"),
    ).drop("_inv")
