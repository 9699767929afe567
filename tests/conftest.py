from __future__ import annotations

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_001 = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from engine.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def index_cfg():
    from engine.config import IndexConfig

    # P=8 matches tests/golden/queries.json; low hot threshold so the
    # salted-merge path is exercised by the fixture's stopword "the".
    return IndexConfig(
        n_build_partitions=8, n_doc_ranges=8, min_hot_df=50, n_term_buckets=8
    )


@pytest.fixture(scope="session")
def built_index(spark, index_cfg):
    """Index over sf0.001 webpages, built once per test session."""
    from engine.build import build_index
    from engine.webpages import load_webpages

    d = tempfile.mkdtemp(prefix="idx_")
    wp = load_webpages(spark, SF_DIR_001)
    return build_index(spark, wp, d, index_cfg)


@pytest.fixture(scope="session")
def goldens():
    import json

    with open(os.path.join(os.path.dirname(__file__), "golden", "queries.json")) as f:
        return json.load(f)
