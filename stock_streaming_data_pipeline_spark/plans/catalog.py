"""Query catalog registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-data additions)
registers here as a named query: a builder ``(spark, sf_dir) -> DataFrame``
and, when the semantics are ANSI-SQL-expressible, an equivalent DuckDB SQL
oracle string. ``__spark_entry__.queries()/oracle_sql()`` are thin views of
this registry.

Parity rules (so the driver's order-insensitive value-hash compare passes):
- column names are aliased identically in the Spark plan and the oracle SQL;
- money-sum outputs go through DECIMAL casts (exact arithmetic in both
  engines; double summation order would otherwise diverge in the last ulp);
- ratio/avg-style doubles are rounded to 6 decimals on both sides;
- timestamps surface as epoch BIGINTs (engine-neutral representation).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    tags: tuple[str, ...] = ()  # SURVEY §2 ids this query covers, e.g. ("A2", "T3")
    bench: bool = False  # include in bench.py's headline set
    doc: str = ""


_REGISTRY: dict[str, CatalogQuery] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog query {name!r}")
        _REGISTRY[name] = CatalogQuery(
            name=name,
            build=fn,
            oracle=oracle.strip() if oracle else None,
            tags=tags,
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every plan module so registrations run."""
    from stock_streaming_data_pipeline_spark.plans import (  # noqa: F401
        finance,
        llmdata,
        relational,
        stock,
        streaming_queries,
        tpch_extra,
    )


def catalog() -> dict[str, CatalogQuery]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, Builder]:
    return {name: q.build for name, q in catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in catalog().items() if q.oracle is not None}


def bench_queries() -> dict[str, Builder]:
    return {name: q.build for name, q in catalog().items() if q.bench}
