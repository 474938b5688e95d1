"""Suite-wide physical-plan invariants over the ENTIRE query
inventory: the hazards that kill 100 TB runs must never appear in
any query's plan.

- CartesianProduct: an unbounded pairwise blowup — every pairwise
  operator here must go through blocking/bucketing keys instead.
- BatchEvalPython: row-at-a-time Python — the only sanctioned Python
  is Arrow-batched (MapInPandas / ArrowEvalPython), and only in the
  media/vector operators, never in SQL surface queries.

Runs at sf0.001 so planning stays cheap; plan shape is SF-invariant
(modulo AQE thresholds, which only swap join strategies, never
introduce these nodes).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_no_cartesian_or_row_python_anywhere(spark, sf_dir):
    offenders = {}
    for name, fn in entry_mod.queries().items():
        p = plan(fn(spark, sf_dir))
        bad = [
            node
            for node in ("CartesianProduct", "BatchEvalPython")
            if node in p
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"plan hazards: {offenders}"


def test_arrow_python_only_in_vector_media_ops(spark, sf_dir):
    # Arrow-batched Python is the sanctioned slow path, but ONLY for
    # operators whose semantics Spark SQL can't express (block-matmul
    # cosine, media decode). SQL queries must stay fully JVM-side.
    allowed_prefixes = ("d05", "m02", "s03")
    for name, fn in entry_mod.queries().items():
        if name.startswith(allowed_prefixes):
            continue
        p = plan(fn(spark, sf_dir))
        assert "MapInPandas" not in p and "ArrowEvalPython" not in p, (
            f"{name} uses Python in its plan but is not a sanctioned "
            "vector/media operator"
        )
