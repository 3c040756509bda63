"""operators/quality.py — declarative constraint semantics.

Key contracts: NULL predicate == violation (a gate must not let null
rows slip through three-valued logic), uniqueness counts EVERY row of
a duplicated key as bad, referential ignores NULL FKs, and all report
shapes union cleanly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.operators.quality import (
    split_by_rules,
    combine_reports,
    referential_check,
    row_checks,
    uniqueness_check,
)


def _by_rule(df):
    return {r["constraint"]: r for r in df.collect()}


def test_row_checks_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None)], "id long, v double"
    )
    rep = _by_rule(row_checks(df, {"v_positive": F.col("v") > 0}))
    row = rep["v_positive"]
    assert row["n_rows"] == 3
    assert row["n_bad"] == 2  # -1.0 fails, NULL fails
    assert abs(row["pass_rate"] - 0.3333) < 1e-9


def test_row_checks_single_pass_many_rules(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    rep = row_checks(
        df,
        {
            "id_pos": F.col("id") > 0,
            "s_in_domain": F.col("s").isin("a", "b"),
            "always_false": F.lit(False),
        },
    )
    rows = _by_rule(rep)
    assert rows["id_pos"]["n_bad"] == 0
    assert rows["s_in_domain"]["pass_rate"] == 1.0
    assert rows["always_false"]["n_bad"] == 2
    # one aggregation pass: exactly one Aggregate in the plan tree
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1


def test_uniqueness_counts_every_duplicated_row(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (3, "w"), (3, "v"), (3, "u")],
        "k long, payload string",
    )
    row = _by_rule(uniqueness_check(df, ["k"]))["unique(k)"]
    assert row["n_rows"] == 6
    assert row["n_bad"] == 5  # both k=1 rows + all three k=3 rows
    assert abs(row["pass_rate"] - 0.1667) < 1e-9


def test_referential_ignores_null_fk(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (4, 10)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = _by_rule(referential_check(child, "fk", parent, "pk"))[
        "ref(fk->pk)"
    ]
    assert row["n_rows"] == 3  # NULL FK excluded from the base
    assert row["n_bad"] == 1  # only fk=99 is an orphan
    assert abs(row["pass_rate"] - 0.6667) < 1e-9


def test_combine_reports_schema_stable(spark):
    df = spark.createDataFrame([(1,)], "id long")
    rep = combine_reports(
        row_checks(df, {"id_pos": F.col("id") > 0}),
        uniqueness_check(df, ["id"]),
    )
    assert rep.columns == ["constraint", "n_rows", "n_bad", "pass_rate"]
    assert rep.count() == 2


def test_split_by_rules_quarantines_with_reasons(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, -3.0, "a"), (3, None, "zz"), (4, 7.0, "b")],
        "id long, v double, s string",
    )
    passing, quarantined = split_by_rules(
        df,
        {
            "v_positive": F.col("v") > 0,
            "s_short": F.length("s") <= 1,
        },
    )
    assert sorted(r["id"] for r in passing.collect()) == [1, 4]
    q = {r["id"]: sorted(r["violations"]) for r in quarantined.collect()}
    assert q == {2: ["v_positive"], 3: ["s_short", "v_positive"]}
    assert passing.columns == ["id", "v", "s"]


def test_split_partitions_exactly_and_reports_bound(spark):
    """Property: for random frames and rule sets, split_by_rules is an
    exact partition (pass + quarantine == input, disjoint) and
    row_checks invariants hold (n_bad <= n_rows, pass_rate in [0,1],
    and the two views agree on the violation count per rule)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.tuples(
            st.integers(0, 5),
            st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=10, deadline=None)
    @given(rows=rows_strategy, cutoff=st.floats(-5, 5, allow_nan=False))
    def prop(rows, cutoff):
        df = spark.createDataFrame(
            [(i, k, v) for i, (k, v) in enumerate(rows)],
            "id long, k long, v double",
        )
        rules = {
            "v_above": F.col("v") > cutoff,
            "k_even": F.col("k") % 2 == 0,
        }
        passing, quarantined = split_by_rules(df, rules)
        got_ids = sorted(
            [r["id"] for r in passing.collect()]
            + [r["id"] for r in quarantined.collect()]
        )
        assert got_ids == list(range(len(rows)))  # exact disjoint split
        rep = {r["constraint"]: r for r in row_checks(df, rules).collect()}
        viol_counts = {name: 0 for name in rules}
        for r in quarantined.collect():
            for name in r["violations"]:
                viol_counts[name] += 1
        for name, row in rep.items():
            assert row["n_rows"] == len(rows)
            assert 0 <= row["n_bad"] <= row["n_rows"]
            assert 0.0 <= row["pass_rate"] <= 1.0
            assert row["n_bad"] == viol_counts[name]

    prop()
