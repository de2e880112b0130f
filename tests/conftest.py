from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from llm_knowledge_graph_spark.session import get_spark
    s = get_spark(app_name="kgspark-tests", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_pages():
    from llm_knowledge_graph_spark.corpus import make_pages
    return make_pages(80, seed=42)


@pytest.fixture(scope="session")
def pages_df(spark, fixture_pages):
    from llm_knowledge_graph_spark.sources.pages import PAGES_SCHEMA
    return spark.createDataFrame(fixture_pages, PAGES_SCHEMA).repartition(4, "url")


@pytest.fixture(scope="session")
def kg_result(spark, pages_df):
    from llm_knowledge_graph_spark.config import PipelineConfig
    from llm_knowledge_graph_spark.plans.pipeline import build_kg
    return build_kg(spark, pages_df, PipelineConfig())


@pytest.fixture(scope="session")
def oracle_graph(fixture_pages):
    from llm_knowledge_graph_spark.reference_impl import reference_pipeline
    return reference_pipeline(fixture_pages)


def pytest_collection_modifyitems(items):
    """Round 5 (VERDICT r4 item 6): every test not explicitly marked
    `heavy` is `core`, so the driver's smoke loop can run the fast gate
    (`pytest -m core`, <90 s) before the full 8-9 min suite. Marking is
    additive — `pytest tests/` still runs everything."""
    import pytest as _pytest
    for item in items:
        if item.get_closest_marker("heavy") is None:
            item.add_marker(_pytest.mark.core)
