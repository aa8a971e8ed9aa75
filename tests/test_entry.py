"""Driver-contract smoke tests for __ray_entry__ (entry/queries/oracle_sql)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as e

    res = e.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    assert sorted(df.columns) == ["doc_id", "kind", "media_ref", "offset", "text"]


def test_contract_shapes():
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    assert len(qs) >= 20
    assert set(sqls) <= set(qs)
    assert len(sqls) >= 14
    for name, fn in qs.items():
        assert callable(fn), name
