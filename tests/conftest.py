import pytest

from entitymatchingmodel_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "emm-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
