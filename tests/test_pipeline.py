"""MaterializedPipeline: artifact durability + recompute minimality."""

import pytest

from youcruit_tap_rawpostgresql_spark.pipeline import (
    MaterializedPipeline,
    Stage,
)


def _counting_stages(spark, calls):
    from pyspark.sql import functions as F

    def extract(sp, inputs):
        calls.append("extract")
        return sp.range(100).select(
            F.col("id"), (F.col("id") % 7).alias("grp")
        )

    def dedup(sp, inputs):
        calls.append("dedup")
        return inputs["extract"].dropDuplicates(["grp"])

    def score(sp, inputs):
        calls.append("score")
        return inputs["dedup"].withColumn("score", F.col("id") * 2)

    return [
        Stage("extract", extract),
        Stage("dedup", dedup, deps=("extract",)),
        Stage("score", score, deps=("dedup",)),
    ]


def test_pipeline_runs_resumes_and_invalidates(spark, tmp_path):
    calls = []
    stages = _counting_stages(spark, calls)
    p = MaterializedPipeline(spark, str(tmp_path / "pipe"), stages)

    r1 = p.run()
    assert [r.skipped for r in r1.values()] == [False, False, False]
    assert calls == ["extract", "dedup", "score"]
    assert p.read("score").count() == 7

    # full resume: nothing recomputes
    calls.clear()
    r2 = p.run()
    assert all(r.skipped for r in r2.values())
    assert calls == []

    # damage stage 2's artifact (simulate crash before meta commit):
    # only dedup + downstream recompute, extract stays cached
    import shutil

    shutil.rmtree(tmp_path / "pipe" / "dedup")
    calls.clear()
    r3 = p.run()
    assert r3["extract"].skipped and not r3["dedup"].skipped
    assert not r3["score"].skipped
    assert calls == ["dedup", "score"]

    # version bump on the ROOT stage invalidates the whole chain
    calls.clear()
    stages2 = _counting_stages(spark, calls)
    stages2[0] = Stage("extract", stages2[0].fn, version="2")
    p2 = MaterializedPipeline(spark, str(tmp_path / "pipe"), stages2)
    r4 = p2.run()
    assert not any(r.skipped for r in r4.values())
    assert calls == ["extract", "dedup", "score"]


def test_pipeline_rejects_cycles_and_unknown_deps(spark, tmp_path):
    a = Stage("a", lambda sp, i: sp.range(1), deps=("b",))
    b = Stage("b", lambda sp, i: sp.range(1), deps=("a",))
    with pytest.raises(ValueError, match="cycle"):
        MaterializedPipeline(spark, str(tmp_path), [a, b])
    with pytest.raises(ValueError, match="unknown deps"):
        MaterializedPipeline(
            spark, str(tmp_path), [Stage("x", lambda sp, i: sp.range(1), deps=("nope",))]
        )


def test_pipeline_on_hadoop_fs_uri(spark, tmp_path):
    """The runner works when root is a Hadoop FS URI (meta and cleanup
    go through the JVM FileSystem API, the same path object stores
    take). file:// exercises that code path end-to-end."""
    calls = []
    stages = _counting_stages(spark, calls)
    root = f"file://{tmp_path}/pipe_uri"
    p = MaterializedPipeline(spark, root, stages)
    r1 = p.run()
    assert not any(r.skipped for r in r1.values())
    assert p.read("score").count() == 7
    calls.clear()
    r2 = p.run()
    assert all(r.skipped for r in r2.values()) and calls == []
