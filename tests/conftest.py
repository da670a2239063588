import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepseek_ocr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = get_spark(parallelism=8, shuffle_partitions=8, app_name="tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
