"""Stateful streaming stats (applyInPandasWithState): cumulative moments
survive across checkpoint-restored runs and agree exactly with a batch
recompute over everything ingested (reference pattern 5, SURVEY §5:
watermark monotonicity / incremental reruns)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyanomalydetector2_spark.operators.stats import moment_stats
from pyanomalydetector2_spark.streaming.stateful import (
    run_increment,
    streaming_moment_state,
)


def _write_batch(spark, path, seed, items=6, rows=400):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "itemid": rng.integers(0, items, rows),
            "clock": rng.integers(1_700_000_000, 1_700_100_000, rows),
            "value": rng.normal(10, 3, rows).round(4),
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)
    return pdf


def test_stateful_moments_resume_and_match_batch(spark, tmp_path):
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")

    out1, out2, out3 = (str(tmp_path / f"out{i}") for i in (1, 2, 3))

    b1 = _write_batch(spark, src, seed=1)
    stats = streaming_moment_state(spark, src)
    run_increment(stats, ckpt, out1)
    got1 = (
        spark.read.parquet(out1).toPandas().sort_values("itemid").set_index("itemid")
    )
    exp1 = (
        moment_stats(spark.createDataFrame(b1), ["itemid"])
        .toPandas()
        .sort_values("itemid")
        .set_index("itemid")
    )
    np.testing.assert_allclose(got1["mean"], exp1["mean"], rtol=1e-9)
    np.testing.assert_allclose(got1["std"], exp1["std"], rtol=1e-9)
    np.testing.assert_array_equal(got1["cnt"], exp1["cnt"])

    # second increment: NEW query instance, SAME checkpoint → state restored,
    # emitted stats are cumulative over batch1 ∪ batch2
    b2 = _write_batch(spark, src, seed=2)
    stats2 = streaming_moment_state(spark, src)
    run_increment(stats2, ckpt, out2)
    got2 = (
        spark.read.parquet(out2).toPandas().sort_values("itemid").set_index("itemid")
    )
    both = pd.concat([b1, b2], ignore_index=True)
    exp2 = (
        moment_stats(spark.createDataFrame(both), ["itemid"])
        .toPandas()
        .sort_values("itemid")
        .set_index("itemid")
    )
    np.testing.assert_allclose(got2["mean"], exp2["mean"], rtol=1e-9)
    np.testing.assert_allclose(got2["std"], exp2["std"], rtol=1e-9)
    np.testing.assert_array_equal(got2["cnt"], exp2["cnt"])

    # idempotent no-op: nothing new to process → foreachBatch never writes
    import os

    stats3 = streaming_moment_state(spark, src)
    run_increment(stats3, ckpt, out3)
    assert not os.path.exists(out3) or not [
        f
        for _root, _dirs, files in os.walk(out3)
        for f in files
        if f.endswith(".parquet")
    ]
