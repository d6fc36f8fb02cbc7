"""Pipeline composition + dual-output DLQ accumulation
(pipeline.py — the PipelineBuilder analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_spark.operators.quality import (
    SchemaVersion, constraint_enforcer, not_null_rule, range_rule, schema_enforcer,
)
from streamforge_spark.pipeline import Pipeline


def test_pipeline_accumulates_dlq(spark):
    df = spark.createDataFrame(
        [(1, '{"k": "1"}', 10.0),
         (2, None, 20.0),            # schema fail (null payload)
         (3, '{"k": "2"}', -5.0),    # constraint fail (range)
         (4, '{"k": "3"}', 30.0)],
        "id long, payload string, amount double")
    v1 = SchemaVersion("v1", required={"k": "number"})
    p = (Pipeline(df)
         .then(lambda d: schema_enforcer(d, "payload", [v1]))
         .then(lambda d: d.withColumn("amount2", F.col("amount") * 2))
         .then(lambda d: constraint_enforcer(
             d, [not_null_rule("amount"), range_rule("amount", 0, 100)])))
    assert sorted(r.id for r in p.df.collect()) == [1, 4]
    dlq = p.dlq()
    assert dlq is not None
    errs = sorted((r.error_type) for r in dlq.collect())
    assert errs == ["CONSTRAINT_VIOLATION", "SCHEMA_VIOLATION"]


def test_pipeline_plain_operators(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    p = Pipeline(df).then(lambda d: d.filter(F.col("id") > 1))
    assert p.dlq() is None
    assert p.df.count() == 2
