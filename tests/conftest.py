import shutil
import tempfile

import pytest


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
