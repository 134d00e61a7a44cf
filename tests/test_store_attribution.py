"""Fit-cost attribution gates (VERDICT r14 #1 / task 2).

Every ``_shared_*`` session memo reachable from a declared query shifts
its build cost out of that query's measured warm time — which is only
honest if ``prefit_stores`` builds it up front and prices it under a
``store_fit`` key in the bench artifact. These tests make the
attribution MECHANICAL: registering a new memo without pricing it
fails the suite, not a future judge pass.

Purely static (AST over the plans package) — no SparkSession needed.
"""

from __future__ import annotations

import ast
import pathlib

from data_warehouse_nhom8_spark.plans import QUERIES, extensions
from data_warehouse_nhom8_spark.plans.extensions import (
    SHARED_STORE_KEY,
    STORE_OF_QUERY,
)

_PLANS_DIR = pathlib.Path(extensions.__file__).parent


def _call_graph() -> dict[str, set[str]]:
    """function name -> every identifier referenced in its body, over
    all modules of the plans package (names are unique enough there;
    a false edge only makes the reachability check stricter)."""
    graph: dict[str, set[str]] = {}
    for py in _PLANS_DIR.glob("*.py"):
        tree = ast.parse(py.read_text())
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                refs = {
                    n.id for n in ast.walk(node) if isinstance(n, ast.Name)
                }
                graph.setdefault(node.name, set()).update(refs)
    return graph


def _reachable_shared(entry_points: list[str]) -> set[str]:
    graph = _call_graph()
    seen: set[str] = set()
    frontier = [n for n in entry_points if n in graph]
    while frontier:
        fn = frontier.pop()
        if fn in seen:
            continue
        seen.add(fn)
        frontier.extend(r for r in graph.get(fn, ()) if r in graph)
    return {n for n in seen if n.startswith("_shared_")}


def test_every_shared_memo_is_prefit() -> None:
    entry = [fn.__name__ for fn in QUERIES.values()]
    reachable = _reachable_shared(entry)
    assert reachable, "call-graph walk found no memos — walker broken?"
    missing = sorted(reachable - set(SHARED_STORE_KEY))
    assert not missing, (
        f"_shared_* memos reachable from declared queries but absent "
        f"from SHARED_STORE_KEY (their fit cost would vanish from the "
        f"bench artifact): {missing}"
    )


def test_prefit_stores_prices_every_registered_key() -> None:
    """prefit_stores' body must assign out["<key>"] for every key in
    SHARED_STORE_KEY — checked statically so the gate costs no fit."""
    src = ast.parse(pathlib.Path(extensions.__file__).read_text())
    fn = next(
        n
        for n in ast.walk(src)
        if isinstance(n, ast.FunctionDef) and n.name == "prefit_stores"
    )
    priced = {
        node.targets[0].slice.value
        for node in ast.walk(fn)
        if isinstance(node, ast.Assign)
        and isinstance(node.targets[0], ast.Subscript)
        and isinstance(node.targets[0].value, ast.Name)
        and node.targets[0].value.id == "out"
        and isinstance(node.targets[0].slice, ast.Constant)
    }
    missing = sorted(set(SHARED_STORE_KEY.values()) - priced)
    assert not missing, f"prefit_stores does not price: {missing}"


def test_store_of_query_keys_are_declared_queries() -> None:
    """STORE_OF_QUERY attributes fit cost per query — a typo'd query
    name would silently attribute nothing."""
    unknown = sorted(set(STORE_OF_QUERY) - set(QUERIES))
    assert not unknown, f"STORE_OF_QUERY names unknown queries: {unknown}"
    unknown_stores = sorted(
        {s for s in STORE_OF_QUERY.values() if s}
        - set(SHARED_STORE_KEY.values())
    )
    assert not unknown_stores, (
        f"STORE_OF_QUERY references store keys prefit never prices: "
        f"{unknown_stores}"
    )
