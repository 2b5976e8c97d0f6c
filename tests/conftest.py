from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")


@pytest.fixture(scope="session")
def spark():
    from daft_minhash_dedupe_spark.session import get_spark

    s = get_spark(
        master="local[4]",
        app_name="tests",
        extra_confs={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
    s.stop()
