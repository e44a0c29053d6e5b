"""Property test for the table-lifecycle surface (r11): a random
sequence of CLONE / SWAP / DROP / UNDROP / RENAME / UPDATE / INSERT
statements over a small family of tables must leave every live table
equal to a pure-Python replay — clones must diverge independently
(zero-copy sharing must never leak writes between tables), swaps must
exchange contents, undrop must restore the latest dropped copy.
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

_NAMES = ["ta", "tb", "tc"]

_op = st.one_of(
    st.tuples(
        st.just("clone"),
        st.sampled_from(_NAMES),
        st.sampled_from(_NAMES),
    ),
    st.tuples(
        st.just("swap"), st.sampled_from(_NAMES), st.sampled_from(_NAMES)
    ),
    st.tuples(st.just("drop"), st.sampled_from(_NAMES)),
    st.tuples(st.just("undrop"), st.sampled_from(_NAMES)),
    st.tuples(
        st.just("rename"), st.sampled_from(_NAMES), st.sampled_from(_NAMES)
    ),
    st.tuples(
        st.just("update"),
        st.sampled_from(_NAMES),
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=1, max_value=9),
    ),
    st.tuples(
        st.just("insert"),
        st.sampled_from(_NAMES),
        st.integers(min_value=100, max_value=900),
    ),
)


@pytest.fixture()
def mk_engine(spark, tmp_path_factory):
    def make():
        root = tmp_path_factory.mktemp("lcprop")
        return Engine(spark, TableStore(str(root / "s")))

    return make


def _apply_model(live: dict, trash: dict, op) -> bool:
    """Mutate the python model; returns False when the op is expected
    to RAISE (caller asserts the engine raises too)."""
    kind = op[0]
    if kind == "clone":
        _, src, dst = op
        if src not in live:
            return False
        if dst in live:  # includes src == dst
            return False
        live[dst] = dict(live[src])
        return True
    if kind == "swap":
        _, a, b = op
        if a not in live or b not in live:
            return False
        live[a], live[b] = live[b], live[a]
        return True
    if kind == "drop":
        name = op[1]
        if name not in live:
            return False
        trash[name] = live.pop(name)
        return True
    if kind == "undrop":
        name = op[1]
        if name in live or name not in trash:
            return False
        live[name] = trash.pop(name)
        return True
    if kind == "rename":
        _, old, new = op
        if old not in live or new in live or old == new:
            return False
        live[new] = live.pop(old)
        return True
    if kind == "update":
        _, name, m, d = op
        if name not in live:
            return False
        live[name] = {
            k: (v + d if k % m == 0 else v) for k, v in live[name].items()
        }
        return True
    # insert
    _, name, base = op
    if name not in live:
        return False
    for k in range(base, base + 3):
        live[name][k] = k  # duplicate keys impossible: bases stride 100
    return True


def _apply_engine(engine, op) -> None:
    kind = op[0]
    if kind == "clone":
        engine.query(f"create table {op[2]} clone {op[1]}")
    elif kind == "swap":
        engine.query(f"alter table {op[1]} swap with {op[2]}")
    elif kind == "drop":
        engine.query(f"drop table {op[1]}")
    elif kind == "undrop":
        engine.query(f"undrop table {op[1]}")
    elif kind == "rename":
        engine.query(f"alter table {op[1]} rename to {op[2]}")
    elif kind == "update":
        _, name, m, d = op
        engine.query(f"update {name} set v = v + {d} where k % {m} = 0")
    else:
        _, name, base = op
        engine.query(
            f"insert into {name} select id + {base}, id + {base} "
            "from range(3)"
        )


@settings(**_SETTINGS)
@given(ops=st.lists(_op, min_size=2, max_size=7))
def test_lifecycle_sequence_matches_python_replay(spark, mk_engine, ops):
    engine = mk_engine()
    engine.query("create table ta as select id as k, id as v from range(8)")
    engine.query(
        "create table tb as select id as k, id * 2 as v from range(4)"
    )
    live = {
        "ta": {k: k for k in range(8)},
        "tb": {k: 2 * k for k in range(4)},
    }
    trash: dict = {}
    # clone of a clone, swap after rename, undrop after re-create — the
    # model tracks the same rules the statements enforce
    for i, op in enumerate(ops):
        if op[0] == "insert":
            # uniquify insert bases per op: the model's dict would
            # dedupe a repeated key the engine's INSERT duplicates
            op = ("insert", op[1], op[2] + 1000 * (i + 1))
        ok = _apply_model(live, trash, op)
        if ok:
            _apply_engine(engine, op)
        else:
            with pytest.raises(Exception):
                _apply_engine(engine, op)
    for name, rows in live.items():
        got = {
            r["k"]: r["v"]
            for r in engine.query(f"select * from {name}").collect()
        }
        assert got == rows, f"table {name} diverged"
    for name in set(_NAMES) - set(live):
        assert not engine.store.exists(name)
