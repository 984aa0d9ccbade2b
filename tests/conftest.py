import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def spark():
    from filters_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="filters_spark_tests",
                  shuffle_partitions=4)
    yield s
    s.stop()
