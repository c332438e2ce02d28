"""Keyed-upsert sink tests: merge semantics across micro-batches and the
bucket-pruning property (untouched bucket partitions are not rewritten)."""

import os

from youcruit_tap_rawpostgresql_spark.streaming.upsert_sink import (
    read_upsert_table,
    upsert_batch,
)


def _files_by_bucket(target):
    out = {}
    for entry in os.listdir(target):
        if entry.startswith("__bucket="):
            b = int(entry.split("=")[1])
            d = os.path.join(target, entry)
            out[b] = sorted(
                (f, os.path.getmtime(os.path.join(d, f)))
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
    return out


def test_upsert_merge_latest_version_wins(spark, tmp_path):
    target = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")], "k int, v int, payload string"
    )
    upsert_batch(spark, b1, target, key="k", version_col="v", n_buckets=4)
    # batch 2: update k=1 with higher version, stale k=2 with lower version,
    # insert k=4; k=3 untouched
    b2 = spark.createDataFrame(
        [(1, 20, "a2"), (2, 5, "stale"), (4, 10, "d")],
        "k int, v int, payload string",
    )
    upsert_batch(spark, b2, target, key="k", version_col="v", n_buckets=4)
    rows = {
        r["k"]: (r["v"], r["payload"])
        for r in read_upsert_table(spark, target).collect()
    }
    assert rows == {1: (20, "a2"), 2: (10, "b"), 3: (10, "c"), 4: (10, "d")}


def test_upsert_within_batch_dedup(spark, tmp_path):
    target = str(tmp_path / "t")
    b = spark.createDataFrame(
        [(1, 1, "old"), (1, 2, "new")], "k int, v int, payload string"
    )
    upsert_batch(spark, b, target, key="k", version_col="v", n_buckets=4)
    rows = read_upsert_table(spark, target).collect()
    assert len(rows) == 1 and rows[0]["payload"] == "new"


def test_upsert_prunes_untouched_buckets(spark, tmp_path):
    target = str(tmp_path / "t")
    # keys spread across many buckets
    b1 = spark.createDataFrame(
        [(k, 1, "x") for k in range(40)], "k int, v int, payload string"
    )
    upsert_batch(spark, b1, target, key="k", version_col="v", n_buckets=8)
    before = _files_by_bucket(target)
    # touch exactly one key → at most one bucket may change
    b2 = spark.createDataFrame([(7, 2, "y")], "k int, v int, payload string")
    upsert_batch(spark, b2, target, key="k", version_col="v", n_buckets=8)
    after = _files_by_bucket(target)
    changed = [b for b in before if before[b] != after.get(b)]
    assert len(changed) <= 1, changed
    # and the merge result is still correct
    rows = {r["k"]: r["payload"] for r in read_upsert_table(spark, target).collect()}
    assert rows[7] == "y" and rows[6] == "x" and len(rows) == 40
