import pytest

from entitymatchingmodel_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # 8g: the whole suite shares one JVM; at ~300 tests the accumulated
    # session state plus the GBT fit's temporary strings OOM a 4g heap
    # (observed twice at suite-end in test_supervised_accuracy, passes in
    # a fresh JVM) — the failure is heap headroom, not any single test
    s = get_spark(
        "emm-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
