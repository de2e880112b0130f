"""Driver-contract invariants for __spark_entry__: the rotation lists
must resolve against the live query pools (a rename in SQL_QUERIES /
KG_QUERIES would otherwise only surface as a KeyError at driver time),
every oracle has a query, and the ordering machinery emits each query
exactly once with the budgeted names first."""

from __future__ import annotations


def _entry():
    import __spark_entry__ as E
    return E


def test_rotation_lists_resolve_and_partition():
    E = _entry()
    qs = E.queries()
    names = list(qs)
    assert len(names) == len(set(names))
    # budgeted order: _FRONT verbatim, then _R6_PRIORITY verbatim
    assert names[:len(E._FRONT)] == E._FRONT
    assert (names[len(E._FRONT):len(E._FRONT) + len(E._R6_PRIORITY)]
            == E._R6_PRIORITY)
    # _TAIL really is the tail
    assert names[-len(E._TAIL):] == E._TAIL
    # the three lists never overlap
    listed = E._FRONT + E._R6_PRIORITY + E._TAIL
    assert len(listed) == len(set(listed))


def test_every_oracle_has_a_query_and_is_sql():
    E = _entry()
    qs, oracles = E.queries(), E.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {sorted(missing)}"
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_queries_are_callables():
    E = _entry()
    for name, fn in E.queries().items():
        assert callable(fn), name
