"""Property test for STREAM consumption (r9): a random sequence of
MERGE-upserts / predicate UPDATEs / DELETEs with interleaved stream
consumptions must deliver, at every consumption, exactly the net
key-level diff since the previous consumption (computed by a pure-
Python replay), with Snowflake's METADATA$ columns — and nothing twice.
The same property machinery that caught two real store bugs in r7
(tests/test_property_dml.py, test_property_store.py).
"""
from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_op = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=-20, max_value=20),
            ),
            min_size=1,
            max_size=4,
        ),
    ),
    st.tuples(
        st.just("bump"),
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=1, max_value=5),
    ),
    st.tuples(
        st.just("delete"),
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=0, max_value=3),
    ),
    st.tuples(st.just("consume")),
)


def _expected_delta(at_offset: dict, now: dict) -> list[tuple]:
    out = []
    for k, v in now.items():
        if k not in at_offset:
            out.append((k, v, "INSERT", False))
        elif at_offset[k] != v:
            out.append((k, at_offset[k], "DELETE", True))
            out.append((k, v, "INSERT", True))
    for k, v in at_offset.items():
        if k not in now:
            out.append((k, v, "DELETE", False))
    return sorted(out)


@pytest.fixture()
def mk_engine(spark, tmp_path_factory):
    def make():
        root = tmp_path_factory.mktemp("stprop")
        return Engine(spark, TableStore(str(root / "s")))

    return make


@settings(**_SETTINGS)
@given(ops=st.lists(_op, min_size=2, max_size=7))
def test_stream_delivers_each_delta_exactly_once(spark, mk_engine, ops):
    engine = mk_engine()
    engine.query("create table t as select 0 as k, 0 as v where 1=0")
    engine.query("alter table t add primary key (k)")
    engine.query("create stream st on table t")
    state: dict[int, int] = {}
    offset_state: dict[int, int] = {}
    n_consumed = 0
    for op in ops:
        kind = op[0]
        if kind == "upsert":
            src = dict(op[1])  # unique keys, last write wins
            union = " union all ".join(
                f"select {k} as k, {v} as v" for k, v in sorted(src.items())
            )
            engine.query(
                f"merge into t using ({union}) src on t.k = src.k "
                "when matched then update set v = src.v "
                "when not matched then insert (k, v) values (src.k, src.v)"
            )
            state.update(src)
        elif kind == "bump":
            _, m, r, d = op
            engine.query(f"update t set v = v + {d} where k % {m} = {r}")
            for k in state:
                if k % m == r:
                    state[k] += d
        elif kind == "delete":
            _, m, r = op
            engine.query(f"delete from t where k % {m} = {r}")
            state = {k: v for k, v in state.items() if k % m != r}
        else:  # consume: verify the delta, then advance via CTAS
            n_consumed += 1
            sink = f"sink_{n_consumed}"
            engine.query(
                f"create table {sink} as select k, v, "
                "`METADATA$ACTION` as a, `METADATA$ISUPDATE` as u from st"
            )
            got = sorted(
                (r["k"], r["v"], r["a"], r["u"])
                for r in engine.query(f"select * from {sink}").collect()
            )
            assert got == _expected_delta(offset_state, state)
            offset_state = dict(state)
    # final read: exactly the tail delta, nothing re-delivered
    got = sorted(
        (r["k"], r["v"], r["a"], r["u"])
        for r in engine.query(
            "select k, v, `METADATA$ACTION` as a, "
            "`METADATA$ISUPDATE` as u from st"
        ).collect()
    )
    assert got == _expected_delta(offset_state, state)
