import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from loc2vec_spark.session import get_spark
    s = get_spark(master="local[4]", app_name="loc2vec_spark_tests",
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Small deterministic fixture tables (images / channels / osm)."""
    from loc2vec_spark.fixtures import write_fixtures
    d = tmp_path_factory.mktemp("fixtures")
    write_fixtures(str(d), n_images=300)
    return str(d)
