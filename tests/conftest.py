import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tangent_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tangent_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf001_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01_dir():
    return "/root/testdata/sf0.01"


def assert_rank_identical(got, expected, tol=1e-9):
    """Compare two [(doc_id, score)] rankings: same docs & scores, order
    identical up to ties within tol (ties must still be id-ascending)."""
    assert len(got) == len(expected), f"{len(got)} != {len(expected)}"
    for (gd, gs), (ed, es) in zip(got, expected):
        assert abs(gs - es) < max(tol, tol * abs(es)), f"score {gs} != {es} (doc {gd}/{ed})"
    # group by indistinguishable scores and compare doc sets per group
    from tangent_spark.oracle import rank_groups

    assert rank_groups(got, tol) == rank_groups(expected, tol)
