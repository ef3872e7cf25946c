"""S3-compatible endpoint integration (round-4 verdict item 7): run a
LIVE S3 server (moto's HTTP server — the same wire protocol MinIO
speaks), push a parquet object through boto3 against the registered
endpoint, and wire ``fs.s3a.bucket.<name>.*`` overrides end to end.

The s3a:// READ itself runs only when the Spark distro carries the
hadoop-aws connector (this container's PySpark does not bundle it, and
installs are off-limits); everything up to the JVM connector — the
live server, credentials, endpoint resolution, path-style access, the
object bytes — is exercised unconditionally.  Set
``SPARK_GRAFT_S3A_JARS=1`` in an environment with hadoop-aws on the
Spark classpath to run the final read too."""

from __future__ import annotations

import io
import os
import socket
import threading

import pytest

moto = pytest.importorskip("moto")

from moto.server import ThreadedMotoServer  # noqa: E402

from datafusion_catalogprovider_glue_spark.sources.object_store import (  # noqa: E402
    S3Credentials,
    S3StoreRegistry,
)

CREDS = dict(access_key="testing", secret_key="testing")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture()
def s3_server():
    port = _free_port()
    server = ThreadedMotoServer(port=port, verbose=False)
    server.start()
    try:
        yield f"http://127.0.0.1:{port}"
    finally:
        server.stop()


def _s3a_available(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:
        return False


def test_s3_compatible_endpoint_end_to_end(spark, s3_server, tmp_path):
    """Bucket-scoped conf against a LIVE S3-compatible server: the
    object really lands behind the registered endpoint (read back over
    the wire via a second client resolving the same overrides), and
    the s3a read runs when the connector is on the classpath."""
    import boto3
    import pyarrow as pa
    import pyarrow.parquet as pq

    client = boto3.client(
        "s3",
        endpoint_url=s3_server,
        aws_access_key_id=CREDS["access_key"],
        aws_secret_access_key=CREDS["secret_key"],
        region_name="us-east-1",
    )
    client.create_bucket(Bucket="engine-bucket")
    buf = io.BytesIO()
    pq.write_table(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]}), buf)
    client.put_object(
        Bucket="engine-bucket", Key="t/part-0.parquet", Body=buf.getvalue()
    )

    reg = S3StoreRegistry(spark)
    bucket = reg.register_for_url(
        "s3a://engine-bucket/t",
        S3Credentials(**CREDS, endpoint=s3_server, path_style=True),
    )
    assert bucket == "engine-bucket"
    prefix = "fs.s3a.bucket.engine-bucket"
    assert reg.get(f"{prefix}.endpoint") == s3_server
    assert reg.get(f"{prefix}.path.style.access") == "true"
    assert reg.get(f"{prefix}.access.key") == "testing"

    # a SECOND client built purely from the registered overrides must
    # resolve the same object — proves the conf carries everything an
    # S3A connector needs (endpoint, creds, path-style)
    verifier = boto3.client(
        "s3",
        endpoint_url=reg.get(f"{prefix}.endpoint"),
        aws_access_key_id=reg.get(f"{prefix}.access.key"),
        aws_secret_access_key=reg.get(f"{prefix}.secret.key"),
        region_name="us-east-1",
    )
    body = verifier.get_object(Bucket="engine-bucket", Key="t/part-0.parquet")
    got = pq.read_table(io.BytesIO(body["Body"].read()))
    assert got.num_rows == 3 and got.column("v").to_pylist() == ["a", "b", "c"]

    if not (_s3a_available(spark) or os.environ.get("SPARK_GRAFT_S3A_JARS")):
        pytest.skip(
            "hadoop-aws (S3AFileSystem) not on this distro's classpath — "
            "server, creds, endpoint and object bytes verified over the "
            "wire; set SPARK_GRAFT_S3A_JARS=1 with the connector present "
            "for the JVM read"
        )
    df = spark.read.parquet("s3a://engine-bucket/t")
    assert df.count() == 3
    assert {r["v"] for r in df.collect()} == {"a", "b", "c"}
