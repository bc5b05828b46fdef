import os
import shutil
import sys
import tempfile

import pytest


def _enable_protobuf_shim() -> None:
    """transformWithStateInPandas needs google.protobuf, which isn't pip-
    installed in this sandbox. A pure-python protobuf runtime (6.32) ships
    inside the system Google Cloud SDK; when the real package is absent and
    that copy exists, put it on sys.path AND the inherited PYTHONPATH (the
    state server runs inside Spark's Python workers, which are forked from
    a daemon that inherits this process's environment — set before the JVM
    starts, i.e. before any SparkSession fixture). pyspark 4.1's gencode is
    6.33 vs the SDK's 6.32 runtime; only the strict version gate differs, so
    use protobuf's own escape hatch for the one-minor skew. No-op wherever
    protobuf is properly installed."""
    try:
        import google.protobuf  # noqa: F401
        return
    except ImportError:
        pass
    shim = "/usr/lib/google-cloud-sdk/platform/google_appengine"
    if not os.path.isdir(os.path.join(shim, "google", "protobuf")):
        return
    sys.path.append(shim)  # append: never shadow real packages
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in (os.environ.get("PYTHONPATH"), shim) if p)
    os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"


_enable_protobuf_shim()


@pytest.fixture(scope="session")
def spark():
    from crawl4ai_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_store():
    d = tempfile.mkdtemp(prefix="c4aspark-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
