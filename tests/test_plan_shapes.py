"""Physical-plan regression tests: the shapes we designed for (pushed
filters, broadcast joins, partial top-k, map-only stages, no stray
shuffles) must survive refactors. Wraps tools/explain_audit.py's CHECKS
so the audit runs in CI, not just by hand — plans only, nothing executes."""

import io
import sys
from contextlib import redirect_stdout

import pytest

sys.path.insert(0, ".")

from goprowl_spark import contract  # noqa: E402

from tools.explain_audit import CHECKS  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(CHECKS))
def test_plan_shape(spark, name):
    must, must_not = CHECKS[name]
    plan = plan_of(contract.queries()[name](spark, SF_DIR))
    for frag in must:
        assert frag in plan, f"{name}: missing {frag!r}\n{plan}"
    for frag in must_not:
        assert frag not in plan, f"{name}: unexpected {frag!r}\n{plan}"


def test_column_pruning_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang")
    )
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan_of(df)
