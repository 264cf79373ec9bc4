import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
# Spark python workers must import parzig_spark too.
os.environ["PYTHONPATH"] = REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


@pytest.fixture(scope="session")
def spark():
    from parzig_spark.session import get_spark

    s = get_spark(app_name="parzig_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
