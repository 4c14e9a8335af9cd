"""Opt-in live Kafka round-trip for S1/S4 (reference engine.py:234-241,
data_ingestion.py:84-109).

This container ships neither the spark-sql-kafka jar nor a broker, so the
Kafka path is normally exercised only through its file-source stand-ins
(test_streaming.py). When an environment provides both:

    SPARK_KAFKA_PACKAGE=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>
    KAFKA_BOOTSTRAP_SERVERS=host:9092

this test builds a session with the package on the classpath, produces a
batch to a throwaway topic via the Kafka sink, reads it back with the S1
streaming scan (availableNow), and checks the payload round-trips through
parse_json_records. Skipped by default so S1/S4 stop being permanently
untested the moment the environment can run them.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

KAFKA_PACKAGE = os.environ.get("SPARK_KAFKA_PACKAGE")
KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")

pytestmark = pytest.mark.skipif(
    not (KAFKA_PACKAGE and KAFKA_BOOTSTRAP),
    reason="set SPARK_KAFKA_PACKAGE and KAFKA_BOOTSTRAP_SERVERS to run the "
    "live Kafka round-trip",
)


@pytest.fixture(scope="module")
def kafka_spark():
    from pyspark.sql import SparkSession

    from projet_pipeline_bigdata_org_spark.session import ensure_runtime_confs

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-smoke")
        .config("spark.jars.packages", KAFKA_PACKAGE)
        .getOrCreate()
    )
    ensure_runtime_confs(spark)
    yield spark
    spark.stop()


def test_kafka_round_trip(kafka_spark, tmp_path):
    from pyspark.sql import functions as F

    from projet_pipeline_bigdata_org_spark.streaming.runtime import (
        kafka_stream,
        parse_json_records,
    )

    topic = f"graft_smoke_{uuid.uuid4().hex[:8]}"
    records = [
        {"id": f"r{i}", "author": "a", "subreddit": "s",
         "text": f"msg {i}", "timestamp": 1700000000.0 + i, "score": i}
        for i in range(5)
    ]
    # S4: batch Kafka producer sink
    (
        kafka_spark.createDataFrame([(json.dumps(r),) for r in records], ["value"])
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    # S1: streaming scan with the reference's options, drained availableNow
    parsed = parse_json_records(kafka_stream(kafka_spark, KAFKA_BOOTSTRAP, topic))
    name = f"k_{uuid.uuid4().hex[:8]}"
    q = (
        parsed.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.id: (r.text, r.score)
        for r in kafka_spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert got == {r["id"]: (r["text"], r["score"]) for r in records}
