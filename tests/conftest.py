from __future__ import annotations

import pytest

from fs2_kinesis_firehose_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fs2-kinesis-firehose-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return "/root/testdata/sf0.01"
