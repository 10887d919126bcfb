"""The bench-only product paths (bharatmlstack_spark/bench_product.py)
are not oracle-gated — they exist to time what ships. Pin the two things
that matter: they produce results, and their plans never degenerate to a
corpus-wide cartesian product (the failure mode the banded/bucketed
designs exist to avoid)."""

import pytest

from bharatmlstack_spark.bench_product import PRODUCT_QUERIES
from bharatmlstack_spark.plans import explain_formatted


@pytest.mark.parametrize("name", sorted(PRODUCT_QUERIES))
def test_product_path_runs_and_is_not_cartesian(spark, sf_dir, name):
    df = PRODUCT_QUERIES[name](spark, sf_dir)
    plan = explain_formatted(df)
    assert "CartesianProduct" not in plan, f"{name} plan degenerated:\n{plan}"
    assert df.count() > 0, f"{name} returned no rows (vacuous product path)"
