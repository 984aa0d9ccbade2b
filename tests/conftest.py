import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Source-checkout registration of the user-facing fixtures; an installed
# wheel gets them automatically via the pytest11 entry point
# (pyproject.toml), same mechanism as the reference library.
from filters_spark.pytest_plugin import (  # noqa: E402,F401
    assert_filter_errors,
    assert_filter_passes,
)


@pytest.fixture(scope="session")
def spark():
    from filters_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="filters_spark_tests",
                  shuffle_partitions=4)
    yield s
    s.stop()
