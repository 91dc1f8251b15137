"""S13 object-store round-trip, gated on a live endpoint.

The reference writes/reads MinIO through boto3 (``scripts/minio_utils.py:
5-40``); the Spark-native equivalent is the s3a filesystem configured by
``session.s3a_conf``. The sandbox has no object store, so this test
SKIPS unless ``S3_ENDPOINT`` (plus the standard AWS credential env vars)
points at a live S3-compatible endpoint — on any environment that has
one (MinIO in docker-compose, a real bucket), it proves the config dict
end-to-end: write parquet to a bucket, truncate-overwrite it (S12), and
read it back.
"""

from __future__ import annotations

import os
import uuid

import pytest

from big_data_pipeline_spark.session import get_spark, s3a_conf

pytestmark = pytest.mark.skipif(
    not os.environ.get("S3_ENDPOINT"),
    reason="no S3-compatible endpoint (set S3_ENDPOINT + AWS creds)",
)


def test_s3a_write_truncate_read_roundtrip():
    bucket = os.environ.get("S3_TEST_BUCKET", "spark-graft-test")
    # A dedicated session: s3a conf must be present at JVM FS init.
    spark = get_spark("s3a-roundtrip", extra_conf=s3a_conf())
    path = f"s3a://{bucket}/roundtrip/{uuid.uuid4().hex}"
    df = spark.range(1000).withColumnRenamed("id", "k")
    df.write.mode("overwrite").parquet(path)
    # S12 truncate semantics: overwrite replaces the object set fully.
    half = df.filter("k < 500")
    half.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert back.agg({"k": "max"}).collect()[0][0] == 499
