"""Masking policies (round 8): Snowflake governance parity.

CREATE MASKING POLICY <p> AS (val <type>) RETURNS <type> -> <expr>;
ALTER TABLE t MODIFY COLUMN c SET/UNSET MASKING POLICY p. The policy
body is Snowflake SQL over the parameter and may branch on
current_role(), resolved from engine.vars['role'] (default PUBLIC).
Enforcement is at the engine read surface — ad-hoc SQL and model refs;
the storage layer stays raw (reference analogue: Snowflake masking
policies, which the reference package's Snowflake tables can carry).
"""
from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "store")))


MASK = (
    "create masking policy email_mask as (val string) returns string -> "
    "case when current_role() in ('ANALYST') then val "
    "else '*** MASKED ***' end"
)


class TestPolicyLifecycle:
    def test_mask_applies_by_default_role(self, spark, engine):
        engine.query(
            "create table users as "
            "select 1 as id, 'a@x.com' as email "
            "union all select 2, 'b@y.org'"
        )
        engine.query(MASK)
        engine.query(
            "alter table users modify column email set masking policy email_mask"
        )
        got = {r["email"] for r in engine.query("select email from users").collect()}
        assert got == {"*** MASKED ***"}
        # unmasked column untouched
        assert engine.query("select id from users").count() == 2

    def test_privileged_role_sees_through(self, spark, engine):
        engine.query("create table u2 as select 'a@x.com' as email")
        engine.query(MASK)
        engine.query(
            "alter table u2 modify column email set masking policy email_mask"
        )
        engine.vars["role"] = "ANALYST"
        got = engine.query("select email from u2").collect()[0]["email"]
        assert got == "a@x.com"

    def test_unset_restores_raw(self, spark, engine):
        engine.query("create table u3 as select 'a@x.com' as email")
        engine.query(MASK)
        engine.query(
            "alter table u3 modify column email set masking policy email_mask"
        )
        engine.query("alter table u3 modify column email unset masking policy")
        got = engine.query("select email from u3").collect()[0]["email"]
        assert got == "a@x.com"

    def test_drop_refuses_while_attached(self, spark, engine):
        engine.query("create table u4 as select 'a@x.com' as email")
        engine.query(MASK)
        engine.query(
            "alter table u4 modify column email set masking policy email_mask"
        )
        with pytest.raises(ValueError, match="attached"):
            engine.query("drop masking policy email_mask")
        engine.query("alter table u4 modify column email unset masking policy")
        assert (
            engine.query("drop masking policy email_mask").collect()[0][
                "policies_dropped"
            ]
            == 1
        )

    def test_show_masking_policies(self, spark, engine):
        engine.query(MASK)
        rows = engine.query("show masking policies").collect()
        assert [r["name"] for r in rows] == ["email_mask"]
        assert rows[0]["param"] == "val"

    def test_create_duplicate_refuses_or_replace_wins(self, spark, engine):
        engine.query(MASK)
        with pytest.raises(ValueError, match="already exists"):
            engine.query(MASK)
        engine.query(
            "create or replace masking policy email_mask as (val string) "
            "returns string -> 'REDACTED'"
        )
        engine.query("create table u5 as select 'x' as email")
        engine.query(
            "alter table u5 modify column email set masking policy email_mask"
        )
        got = engine.query("select email from u5").collect()[0]["email"]
        assert got == "REDACTED"

    def test_broken_body_fails_at_create(self, spark, engine):
        with pytest.raises(Exception):
            engine.query(
                "create masking policy bad as (val string) returns string "
                "-> case when ((("
            )
        assert engine.query("show masking policies").count() == 0

    def test_attach_to_missing_policy_refuses(self, spark, engine):
        engine.query("create table u6 as select 'x' as email")
        with pytest.raises(ValueError, match="not found"):
            engine.query(
                "alter table u6 modify column email set masking policy nope"
            )


class TestMaskingSemantics:
    def test_param_name_inside_string_literal_untouched(self, spark, engine):
        """A policy body whose STRING literal contains the parameter
        name must not have it substituted."""
        engine.query("create table u7 as select 'secret' as note")
        engine.query(
            "create masking policy lit as (val string) returns string -> "
            "case when current_role() = 'ADMIN' then val else 'no val here' end"
        )
        engine.query("alter table u7 modify column note set masking policy lit")
        got = engine.query("select note from u7").collect()[0]["note"]
        assert got == "no val here"

    def test_partial_mask_expression(self, spark, engine):
        """Snowflake's common partial-mask idiom: keep the domain."""
        engine.query("create table u8 as select 'alice@example.com' as email")
        engine.query(
            "create masking policy dom as (val string) returns string -> "
            "case when current_role() in ('ANALYST') then val "
            "else '****' || substr(val, position('@' in val)) end"
        )
        engine.query("alter table u8 modify column email set masking policy dom")
        got = engine.query("select email from u8").collect()[0]["email"]
        assert got == "****@example.com"

    def test_numeric_policy_keeps_column_type(self, spark, engine):
        engine.query("create table u9 as select 75000 as salary, 1 as id")
        engine.query(
            "create masking policy sal as (val int) returns int -> "
            "case when current_role() = 'HR' then val else null end"
        )
        engine.query("alter table u9 modify column salary set masking policy sal")
        df = engine.query("select salary, id from u9")
        assert df.schema["salary"].dataType.typeName() in ("integer", "long")
        assert df.collect()[0]["salary"] is None

    def test_mask_survives_table_rewrite(self, spark, engine):
        """Attachment lives in _META and must survive UPDATE rewrites."""
        engine.query("create table u10 as select 'a@x.com' as email, 1 as id")
        engine.query(MASK)
        engine.query(
            "alter table u10 modify column email set masking policy email_mask"
        )
        engine.query("update u10 set id = 2")
        got = engine.query("select email from u10").collect()[0]["email"]
        assert got == "*** MASKED ***"

    def test_model_ref_is_masked_too(self, spark, engine):
        """A dbt-style model reading a masked table via ref() sees
        masked data — Snowflake behavior for non-exempt roles."""
        engine.query("create table src_pii as select 'a@x.com' as email")
        engine.query(MASK)
        engine.query(
            "alter table src_pii modify column email set masking policy email_mask"
        )
        got = engine.ref("src_pii").collect()[0]["email"]
        assert got == "*** MASKED ***"

    def test_ctas_from_masked_view_stores_masked(self, spark, engine):
        """CTAS through the SQL surface snapshots what the role can
        see (the masked projection), like Snowflake CTAS under a
        masking policy."""
        engine.query("create table src2 as select 'a@x.com' as email")
        engine.query(MASK)
        engine.query(
            "alter table src2 modify column email set masking policy email_mask"
        )
        engine.query("create table copy2 as select email from src2")
        engine.vars["role"] = "ANALYST"  # even the privileged role
        got = engine.query("select email from copy2").collect()[0]["email"]
        assert got == "*** MASKED ***"
