import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TESTS = os.path.join(_REPO, "tests")
sys.path.insert(0, _REPO)

# Spark python workers unpickle UDF callables defined in test modules; the
# workers inherit PYTHONPATH from the environment (not the driver's sys.path),
# so export it BEFORE the JVM/session starts.
_existing = os.environ.get("PYTHONPATH", "")
_wanted = os.pathsep.join(p for p in (_REPO, _TESTS, _existing) if p)
os.environ["PYTHONPATH"] = _wanted

from kioss_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # lighter for unit tests
    spark = get_spark("kioss_spark_tests", shuffle_partitions=8)
    spark.conf.set("spark.executorEnv.PYTHONPATH", _wanted)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
