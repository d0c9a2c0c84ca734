import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_DATE = "2026-01-15"
N_ROWS = 600


@pytest.fixture(scope="session")
def spark():
    from webxtract.session import get_spark

    spark = get_spark(
        app_name="webxtract-tests",
        master="local[4]",
        shuffle_partitions=4,
        # UI on (random port): the audit's per-task wall_ms reads the
        # status REST API, and tests assert it is populated
        extra_conf={"spark.ui.port": "0", "spark.driver.memory": "4g"},
    )
    yield spark


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    """Synthetic corpus on disk: (pages_path, expected pandas frame)."""
    from webxtract.synth import gen_pages, to_parquet

    root = tmp_path_factory.mktemp("corpus")
    pages, expected = gen_pages(N_ROWS, RUN_DATE)
    pages_path = str(root / "pages.parquet")
    to_parquet(pages, pages_path)
    return pages_path, expected


@pytest.fixture(scope="session")
def run_date():
    return dt.date.fromisoformat(RUN_DATE)
