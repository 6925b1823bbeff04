from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.01"
SF_DIR_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from cuckoofilter_spark.session import get_spark

    s = get_spark(app="cuckoofilter-tests", cores=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
