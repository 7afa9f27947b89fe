"""Logan ingest seam (S8/S9 + itemidmap): fixture-dir ingest end-to-end into
the history snapshot — min-group-size filter, collision-free surrogate keys,
item-details per group, watermark advance, retention, idempotent re-run
(reference pattern: tests/test_topitems_logan.py against a throwaway HTTP
server; here the mirrored-directory layout the reference caches to)."""

from __future__ import annotations

import os

import pytest

from pyanomalydetector2_spark.sources.logan_source import (
    SURROGATE_BASE,
    LoganIngest,
)


@pytest.fixture()
def fixture_dir(tmp_path):
    """Two hosts; host1 has one big and one small log group; host12's org
    item 3 would collide with host1's item 23 under the reference's string
    concat (1||23 == 12||3 == '123')."""
    for host, groups, history in [
        (
            "host1",
            [(23, 5000, 0.9, "big group alpha"), (7, 10, 0.1, "tiny group")],
            [(23, 1000, 1.5), (23, 1600, 2.5), (7, 1000, 9.9)],
        ),
        (
            "host12",
            [(3, 2000, 0.5, "beta group")],
            [(3, 1000, 7.0), (3, 1600, 8.0)],
        ),
    ]:
        d = tmp_path / "mirror" / host
        d.mkdir(parents=True)
        (d / "logGroups.csv").write_text(
            "itemid,count,score,text\n"
            + "\n".join(f"{i},{c},{s},{t}" for i, c, s, t in groups)
        )
        (d / "history.csv").write_text(
            "itemid,clock,value\n" + "\n".join(f"{i},{k},{v}" for i, k, v in history)
        )
    return str(tmp_path / "mirror"), str(tmp_path / "wh")


def test_ingest_end_to_end(spark, fixture_dir):
    base, wh = fixture_dir
    ing = LoganIngest(wh, minimal_group_size=100, trends_interval=600,
                      trends_retention=10)
    merged = ing.import_data(
        spark,
        base,
        groups={"g1": {1: "host1"}, "g2": {12: "host12"}},
        updated=42,
    )
    assert merged == {1: 3, 12: 2}

    hist = ing.history.read(spark)
    ids = {r["itemid"] for r in hist.select("itemid").distinct().collect()}
    # surrogate keys are collision-free: host1/item23 != host12/item3
    # (the reference's int(f"{hostId}{itemId}") maps both to 123)
    assert ids == {SURROGATE_BASE + 23, SURROGATE_BASE + 7, 12 * SURROGATE_BASE + 3}

    imap = {r["itemid"]: r for r in ing.itemidmap.read(spark).collect()}
    # only groups >= minimal_group_size are mapped (item 7's group size 10 < 100)
    assert set(imap) == {SURROGATE_BASE + 23, 12 * SURROGATE_BASE + 3}
    assert imap[SURROGATE_BASE + 23]["org_itemid"] == 23
    assert imap[SURROGATE_BASE + 23]["hostid"] == 1
    assert all(r["updated"] == 42 for r in imap.values())

    det = ing.item_details.read(spark).collect()
    assert {(r["group_name"], r["hostid"], r["item_name"]) for r in det} == {
        ("g1", 1, "big group alpha"),
        ("g2", 12, "beta group"),
    }

    # watermark advanced to the max clock; retention keeps everything (window
    # = 6000s > data span)
    assert ing.watermark.get_endep() == 1600
    assert hist.count() == 5

    # idempotent re-run: MERGE on (itemid, clock) leaves counts unchanged
    merged2 = ing.import_data(
        spark, base, groups={"g1": {1: "host1"}, "g2": {12: "host12"}}, updated=43
    )
    assert merged2 == {1: 3, 12: 2}
    assert ing.history.read(spark).count() == 5
    assert ing.itemidmap.read(spark).count() == 2  # upsert, not append


def test_min_group_size_can_drop_whole_host(spark, fixture_dir):
    base, wh = fixture_dir
    ing = LoganIngest(wh, minimal_group_size=10_000)
    merged = ing.import_data(spark, base, groups={"g1": {1: "host1"}}, updated=1)
    assert merged == {1: 0}
    with pytest.raises(FileNotFoundError):
        ing.history.read(spark)


def test_retention_trims_old_clocks(spark, fixture_dir):
    base, wh = fixture_dir
    ing = LoganIngest(
        wh, minimal_group_size=100, trends_interval=100, trends_retention=3
    )
    ing.import_data(spark, base, groups={"g1": {1: "host1"}}, updated=1)
    hist = ing.history.read(spark)
    # window = 300s from endep 1600 → clock 1000 rows expired
    assert {r["clock"] for r in hist.collect()} == {1600}
