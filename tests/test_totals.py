"""The README/COVERAGE totals must be derived from the registry, not
hand-written — they have drifted twice before (ADVICE r3/r4)."""

import importlib.util
import os


def _load_totals():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "totals.py")
    spec = importlib.util.spec_from_file_location("totals", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_totals_match_docs():
    mod = _load_totals()
    nq, no = mod.registry_totals()
    assert nq >= 668 and no >= 633  # totals only ever grow
    assert mod.check_docs(nq, no) == []


def test_every_oracle_key_has_a_query():
    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
