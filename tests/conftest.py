import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))  # for `helpers`


@pytest.fixture(scope="session")
def spark():
    from mapbox_vector_tile_java_spark.session import get_spark

    s = get_spark("tests", cores=os.environ.get("SPARK_GRAFT_CPUS", "8"),
                  arrow_batch_rows=8192)
    yield s
    s.stop()
