from __future__ import annotations

import pytest

from polars_text_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "polars-text-spark-tests",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
