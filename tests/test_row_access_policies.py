"""Row access policies (round 9): Snowflake governance parity.

CREATE ROW ACCESS POLICY <p> AS (<a> <t>[, ...]) RETURNS BOOLEAN ->
<expr>; ALTER TABLE t ADD/DROP ROW ACCESS POLICY p ON (cols). Rows
where the body evaluates TRUE (for the session role, engine.vars
['role']) are visible; FALSE and NULL hide. One policy per table,
applied BEFORE column masking policies — the filter sees raw values.
Reference analogue: Snowflake row access policies the package's target
tables can carry (the r8 store plumbing, engine/store.py, now driven
by the DML surface in engine/dml.py and enforced in
engine/dag.py::_policy_masked).
"""
from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "store")))


RA = (
    "create row access policy region_ra as (r string) returns boolean -> "
    "current_role() = 'ADMIN' or r = 'EU'"
)


def _mk_sales(engine):
    engine.query(
        "create table sales as "
        "select 1 as id, 'EU' as region, 100 as amount "
        "union all select 2, 'US', 200 "
        "union all select 3, 'EU', 300"
    )


class TestRowAccessLifecycle:
    def test_filter_applies_by_default_role(self, spark, engine):
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        got = sorted(
            r["id"] for r in engine.query("select id from sales").collect()
        )
        assert got == [1, 3]

    def test_privileged_role_sees_all(self, spark, engine):
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        engine.vars["role"] = "ADMIN"
        assert engine.query("select id from sales").count() == 3

    def test_drop_restores_all_rows(self, spark, engine):
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        engine.query("alter table sales drop row access policy region_ra")
        assert engine.query("select id from sales").count() == 3

    def test_drop_all_form(self, spark, engine):
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        engine.query("alter table sales drop all row access policies")
        assert engine.query("select id from sales").count() == 3

    def test_drop_named_mismatch_refuses(self, spark, engine):
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        with pytest.raises(ValueError, match="not attached"):
            engine.query("alter table sales drop row access policy other_ra")

    def test_one_policy_per_table(self, spark, engine):
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "create row access policy ra2 as (r string) returns boolean -> "
            "r = 'US'"
        )
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        with pytest.raises(ValueError, match="already has"):
            engine.query(
                "alter table sales add row access policy ra2 on (region)"
            )

    def test_drop_policy_object_refuses_while_attached(self, spark, engine):
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        with pytest.raises(ValueError, match="attached"):
            engine.query("drop row access policy region_ra")
        engine.query("alter table sales drop row access policy region_ra")
        assert (
            engine.query("drop row access policy region_ra").collect()[0][
                "policies_dropped"
            ]
            == 1
        )

    def test_show_row_access_policies(self, spark, engine):
        engine.query(RA)
        engine.query(
            "create masking policy m1 as (val string) returns string -> "
            "'***'"
        )
        rows = engine.query("show row access policies").collect()
        assert [r["name"] for r in rows] == ["region_ra"]
        assert rows[0]["signature"] == "r string"
        # mixed-kind policy store must not crash SHOW MASKING POLICIES
        # (ADVICE r8 #2: KeyError on p['param'] for row_access entries)
        mrows = engine.query("show masking policies").collect()
        assert [r["name"] for r in mrows] == ["m1"]

    def test_create_duplicate_refuses_or_replace_wins(self, spark, engine):
        engine.query(RA)
        with pytest.raises(ValueError, match="already exists"):
            engine.query(RA)
        engine.query(
            "create or replace row access policy region_ra as (r string) "
            "returns boolean -> r = 'US'"
        )
        _mk_sales(engine)
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        got = [r["id"] for r in engine.query("select id from sales").collect()]
        assert got == [2]

    def test_non_boolean_body_fails_at_create(self, spark, engine):
        with pytest.raises(ValueError, match="BOOLEAN"):
            engine.query(
                "create row access policy bad as (r string) returns boolean "
                "-> upper(r)"
            )
        assert engine.query("show row access policies").count() == 0

    def test_broken_body_fails_at_create(self, spark, engine):
        with pytest.raises(Exception):
            engine.query(
                "create row access policy bad as (r string) returns boolean "
                "-> case when ((("
            )
        assert engine.query("show row access policies").count() == 0

    def test_param_count_mismatch_refuses(self, spark, engine):
        _mk_sales(engine)
        engine.query(
            "create row access policy two as (a string, b int) returns "
            "boolean -> a = 'EU' and b > 100"
        )
        with pytest.raises(ValueError, match="column"):
            engine.query(
                "alter table sales add row access policy two on (region)"
            )

    def test_multi_column_policy(self, spark, engine):
        _mk_sales(engine)
        engine.query(
            "create row access policy two as (a string, b int) returns "
            "boolean -> a = 'EU' and b > 100"
        )
        engine.query(
            "alter table sales add row access policy two on (region, amount)"
        )
        got = [r["id"] for r in engine.query("select id from sales").collect()]
        assert got == [3]


class TestKindSeparation:
    """Masking and row access policies share the policy store but are
    separate statement namespaces — cross-kind use must fail loudly."""

    def test_row_access_policy_cannot_mask_a_column(self, spark, engine):
        _mk_sales(engine)
        engine.query(RA)
        with pytest.raises(ValueError, match="row_access"):
            engine.query(
                "alter table sales modify column region "
                "set masking policy region_ra"
            )

    def test_masking_policy_cannot_row_filter(self, spark, engine):
        _mk_sales(engine)
        engine.query(
            "create masking policy m1 as (val string) returns string -> '*'"
        )
        with pytest.raises(ValueError, match="not found"):
            engine.query(
                "alter table sales add row access policy m1 on (region)"
            )

    def test_cross_kind_drop_refuses(self, spark, engine):
        engine.query(RA)
        engine.query(
            "create masking policy m1 as (val string) returns string -> '*'"
        )
        with pytest.raises(ValueError, match="MASKING"):
            engine.query("drop row access policy m1")
        with pytest.raises(ValueError, match="ROW ACCESS"):
            engine.query("drop masking policy region_ra")

    def test_mask_type_mismatch_fails_at_attach(self, spark, engine):
        """ADVICE r8 #3: a string-returning policy on a double column
        must fail the ALTER, not the first read."""
        _mk_sales(engine)
        engine.query(
            "create masking policy strmask as (val string) returns string "
            "-> '***'"
        )
        with pytest.raises(ValueError, match="return type"):
            engine.query(
                "alter table sales modify column amount "
                "set masking policy strmask"
            )


class TestEnforcementSurfaces:
    def test_filter_survives_table_rewrite(self, spark, engine):
        """row_access attachment lives in _META and must survive an
        UPDATE rewrite (ADVICE r8 #2: _set_meta dropped it)."""
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        engine.query("update sales set amount = amount + 1")
        got = sorted(
            r["id"] for r in engine.query("select id from sales").collect()
        )
        assert got == [1, 3]

    def test_composes_with_masking_filter_sees_raw(self, spark, engine):
        """Row access applies BEFORE masking (Snowflake order): a
        policy keyed on a column that is ALSO masked filters on the
        raw value, while the output shows the masked one."""
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "create masking policy regmask as (val string) returns string "
            "-> case when current_role() = 'ADMIN' then val else 'XX' end"
        )
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        engine.query(
            "alter table sales modify column region "
            "set masking policy regmask"
        )
        rows = engine.query("select id, region from sales").collect()
        assert sorted(r["id"] for r in rows) == [1, 3]  # raw EU filter
        assert {r["region"] for r in rows} == {"XX"}  # masked output

    def test_model_ref_is_filtered(self, spark, engine):
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        assert engine.ref("sales").count() == 2

    def test_time_travel_read_is_governed(self, spark, engine):
        """ADVICE r8 #1 (medium): AT(VERSION => n) must route through
        _policy_masked — previously a raw read_version view let any
        role read unmasked PII / hidden rows via time travel."""
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "create masking policy amtmask as (val int) returns int -> "
            "case when current_role() = 'ADMIN' then val else -1 end"
        )
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        engine.query(
            "alter table sales modify column amount set masking policy amtmask"
        )
        engine.query("update sales set region = 'US' where id = 1")  # v1
        rows = engine.query(
            "select id, amount from sales at(version => 0) order by id"
        ).collect()
        # v0 had EU rows 1 and 3; both amounts masked for PUBLIC
        assert [r["id"] for r in rows] == [1, 3]
        assert {r["amount"] for r in rows} == {-1}
        engine.vars["role"] = "ADMIN"
        rows = engine.query(
            "select id, amount from sales at(version => 0) order by id"
        ).collect()
        assert [(r["id"], r["amount"]) for r in rows] == [
            (1, 100),
            (2, 200),
            (3, 300),
        ]

    def test_cdc_read_is_governed(self, spark, engine):
        """Engine.table_changes applies policies to change rows; the
        raw store.read_changes stays a documented storage-level API."""
        _mk_sales(engine)
        engine.query(RA)
        engine.query(
            "alter table sales add row access policy region_ra on (region)"
        )
        engine.query("update sales set amount = amount + 10")  # v1
        ch = engine.table_changes("sales", 0, 1, "id")
        # only EU rows' changes are visible to PUBLIC
        assert sorted(set(r["id"] for r in ch.collect())) == [1, 3]
        raw = engine.store.read_changes(engine.spark, "sales", 0, 1, "id")
        assert sorted(set(r["id"] for r in raw.collect())) == [1, 2, 3]

    def test_null_policy_result_hides_row(self, spark, engine):
        engine.query(
            "create table t0 as select 1 as id, cast(null as string) as r "
            "union all select 2, 'EU'"
        )
        engine.query(RA)
        engine.query("alter table t0 add row access policy region_ra on (r)")
        got = [r["id"] for r in engine.query("select id from t0").collect()]
        assert got == [2]  # NULL predicate result hides, SQL semantics
