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


def test_streaming_versioned_sink_exactly_once(spark, sf_dir, tmp_path):
    """Streaming → versioned table: one snapshot per micro-batch with the
    batch_id in the manifest; re-applying an already-committed batch id
    (foreachBatch redelivery after restart) is a no-op, and the final
    state equals the full input exactly once."""
    import json as _json

    from youcruit_tap_rawpostgresql_spark.sink import write_batch_files
    from youcruit_tap_rawpostgresql_spark.sources import singer_batch, versioned
    from youcruit_tap_rawpostgresql_spark.sources.registry import load_table
    from youcruit_tap_rawpostgresql_spark.spec import (
        BatchSinkConfig,
        ColumnSpec,
        StreamSpec,
    )
    from youcruit_tap_rawpostgresql_spark.streaming.upsert_sink import (
        run_streaming_versioned_sink,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    spec = StreamSpec(
        name="ev",
        sql="SELECT 1",
        columns=[ColumnSpec("event_id", "int8"), ColumnSpec("event_type", "text")],
    )
    man_dir = tmp_path / "mans"
    man_dir.mkdir()

    def export(i, mod):
        sl = ev.filter((ev["event_id"] % 2) == mod)
        b = BatchSinkConfig(root=f"file://{tmp_path}/files_{i}", batch_size=10**6)
        m = write_batch_files(sl, spec, b)[0]
        with open(man_dir / f"sync-{i:04d}.json", "w") as fh:
            _json.dump(m.to_message("ev"), fh)
        return sl.count()

    n0 = export(0, 0)
    singer_batch.register(spark)
    root = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ck")

    def run():
        q = run_streaming_versioned_sink(
            spark.readStream.format("singer_batch")
            .schema("event_id long, event_type string")
            .load(str(man_dir)),
            root,
            ckpt,
            key="event_id",
        )
        q.awaitTermination(120)

    run()
    assert versioned.read_version(spark, root).count() == n0
    v_after_first = versioned.current_version(root)
    # second slice arrives; restart the stream from the same checkpoint
    n1 = export(1, 1)
    run()
    cur = versioned.read_version(spark, root)
    assert cur.count() == n0 + n1
    assert cur.select("event_id").distinct().count() == n0 + n1
    # idempotence: re-running with no new manifests commits nothing
    v_now = versioned.current_version(root)
    run()
    assert versioned.current_version(root) == v_now
    # manifests carry the stream transaction marker
    man = versioned._read_manifest(root, v_now)
    assert man["op"].startswith("stream-batch-")
    assert man["txn"]["batch_id"] >= 0
    # an INTERLEAVED non-stream commit (tap sync / compaction) must not
    # erase the stream's batch memory: re-running after it still skips
    # already-committed batches (txn markers are scanned across the log)
    extra_rows = ev.limit(3).withColumn(
        "event_id", ev["event_id"] + 10_000_000
    )
    versioned.commit_snapshot(extra_rows, root, mode="append", op="manual-fix")
    v_manual = versioned.current_version(root)
    run()
    assert versioned.current_version(root) == v_manual  # nothing re-applied
