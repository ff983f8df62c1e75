from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DOCS = Path("/root/reference/ocr_service/tests/resources/docs")
GOLDEN_DIR = REPO_ROOT / "tests" / "golden"


@pytest.fixture(scope="session")
def fixture_bytes():
    def load(rel: str) -> bytes:
        return (REFERENCE_DOCS / rel).read_bytes()

    return load


@pytest.fixture(scope="session")
def spark():
    """Session-scoped local SparkSession (local[4] keeps tests snappy)."""
    from ocr_service_spark.plans.session import build_session

    spark = build_session(app_name="ocr-service-spark-tests", cpus=4, shuffle_partitions=8)
    yield spark
    spark.stop()
