"""Staleness gate for the frozen golden parquets (goldens/*.parquet).

The six formula-path driver contract entries use frozen golden parquets
as their DuckDB oracle (see scripts/build_goldens.py). Their ground
truth is the pytest parity suite vs the reference implementation and
its shipped result files — but the driver hash check is only meaningful
while the frozen file matches what the engine currently computes. This
test recomputes every golden query live and asserts frame equality with
the committed parquet, so a semantics change without a golden refresh
(or a refresh without a semantics change) fails loudly instead of
silently turning the driver check into engine-vs-stale-snapshot.
"""

import os

import pandas as pd
import pytest

from scripts.build_goldens import GOLDEN_NAMES, golden_dir


@pytest.mark.parametrize("name", GOLDEN_NAMES)
def test_golden_parquet_not_stale(spark, name):
    import tangent_spark.entry_queries as eq

    path = os.path.join(golden_dir(), f"{name}.parquet")
    assert os.path.exists(path), f"missing golden {path}; run scripts/build_goldens.py"
    frozen = pd.read_parquet(path)
    live = getattr(eq, name)(spark, "").toPandas()
    live = live.sort_values(list(live.columns)).reset_index(drop=True)
    frozen = frozen.sort_values(list(frozen.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        live, frozen, check_dtype=True, check_exact=True,
        obj=f"golden {name} (stale — rerun scripts/build_goldens.py if the "
        "semantics change was intentional AND parity tests still pass)",
    )
