from __future__ import annotations

import pytest

from kenshin_backup_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("kenshin-tests")
    yield spark
