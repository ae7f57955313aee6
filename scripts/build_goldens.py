"""Materialize golden parquet twins for the formula-path driver queries.

The four MathML-derived contract queries (t1_slt_parse, t7_pair_tuples,
f8_dice_topk, r5_mss_rerank) plus r7_v11_rerank cannot be expressed in
DuckDB SQL (SLT parsing / tree alignment). Their correctness evidence
is pytest parity against the reference implementation and against the
reference's own shipped result files (tests/test_slt.py,
test_golden_parity.py, test_mss.py, test_golden_rerank.py). This script
freezes each query's output to goldens/<name>.parquet so the driver's
DuckDB oracle becomes a trivial `SELECT * FROM read_parquet(...)` —
turning the rows-only check into a full value-hash check, with the
parity suite as the actual ground truth behind the frozen file.

Deterministic by construction: the synthetic corpus is seeded, the
queries order their output, and parquet is written via pyarrow from a
sorted pandas frame. Re-run after changing formula semantics:
    python scripts/build_goldens.py
and commit the refreshed files. tests/test_goldens.py recomputes every
golden live each run and fails on any divergence from the frozen file,
so a stale golden (or an unintended semantics change) cannot slip
through; tests/test_entry_contract.py additionally checks the driver
output against the same parquet.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN_NAMES = ["t1_slt_parse", "t7_pair_tuples", "f8_dice_topk",
                "q5f_wildcard_dice", "r5_mss_rerank", "r7_v11_rerank",
                "api_formula_route", "ann_pq_topk"]


def golden_dir() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "goldens")


def build(spark, out_dir: str | None = None) -> dict[str, int]:
    import tangent_spark.entry_queries as eq

    out_dir = out_dir or golden_dir()
    os.makedirs(out_dir, exist_ok=True)
    counts = {}
    for name in GOLDEN_NAMES:
        df = getattr(eq, name)(spark, "").toPandas()
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
        df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
        counts[name] = len(df)
    return counts


if __name__ == "__main__":
    from tangent_spark.session import get_spark

    spark = get_spark(cpus=8)
    for name, n in build(spark).items():
        print(f"{name}: {n} rows")
