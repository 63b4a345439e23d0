from __future__ import annotations

import os

import pytest

from database_activity_monitoring_dam_system_spark.session import get_spark

# Parity tests default to sf0.001 for speed; set SPARK_GRAFT_TEST_SF to
# sf0.01 to replicate the driver's t2 gate scale exactly.
SF_SMOKE = f"/root/testdata/{os.environ.get('SPARK_GRAFT_TEST_SF', 'sf0.001')}"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dam-tests", shuffle_partitions=8)
    yield s
