"""Query registry: every declared operator pairs a Spark plan callable with an
optional DuckDB oracle (None -> rows-only check at t2). An oracle may be a
SQL string or a zero-arg callable returning one — callables are resolved at
``oracle_sql()`` call time, for oracles whose SQL embeds a runtime-resolved
path (the materialized-cluster snapshots)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, object]] = {}


def register(name: str, oracle: str | Callable[[], str] | None):
    def deco(fn: QueryFn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def promote_window(names: list[str]) -> None:
    """Reorder the registry so ``names`` lead registration in the given
    order (the external driver's correctness run evaluates only the first
    ~50 entries — entry_queries.py documents the rotation policy). Unknown
    names are an error: a typo here would silently hand a window slot to
    the wrong query."""
    missing = [n for n in names if n not in _REGISTRY]
    if missing:
        raise ValueError(f"promote_window: unregistered queries {missing}")
    rest = {k: v for k, v in _REGISTRY.items() if k not in set(names)}
    promoted = {n: _REGISTRY[n] for n in names}
    _REGISTRY.clear()
    _REGISTRY.update(promoted)
    _REGISTRY.update(rest)


def oracle_sql() -> dict[str, str]:
    return {
        name: (sql() if callable(sql) else sql)
        for name, (_, sql) in _REGISTRY.items()
        if sql is not None
    }


def get_oracle(name: str) -> str:
    """Resolve ONE registered oracle (for composite queries that embed
    another query's SQL — resolving the full dict from inside a callable
    oracle would recurse)."""
    sql = _REGISTRY[name][1]
    return sql() if callable(sql) else sql
