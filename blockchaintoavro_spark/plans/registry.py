"""Declared-query registry — the engine↔oracle correctness contract.

Every operator the engine claims (SURVEY.md §2) is declared here as a pair:
a PySpark builder ``(spark, sf_dir) -> DataFrame`` and (where SQL-expressible)
an equivalent DuckDB oracle SQL string over the same parquet tables. The
driver hash-compares both at sf0.01 (order-insensitive, columns sorted by
name) — so builders and oracles MUST agree on output column names.

Canonicalization (FIXTURES.md §4): UTC; float outputs decimal-cast with
decimal-cast inputs before aggregation; total ORDER BY (determinism for
LIMIT queries); binary → lowercase hex.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass
class DeclaredQuery:
    name: str
    spark: SparkBuilder
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, DeclaredQuery] = {}


def declare(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkBuilder], SparkBuilder]:
    """Decorator: register a declared query under ``name``."""

    def wrap(fn: SparkBuilder) -> SparkBuilder:
        prev = REGISTRY.get(name)
        if prev is not None and prev.spark is not fn:
            # a duplicate name silently REPLACES the earlier query in
            # the driver's surface — coverage vanishes without any test
            # failing (nearly happened r13: a new x_hash_split shadowed
            # the quality.py one). Fail at import instead.
            raise ValueError(
                f"declared query name {name!r} registered twice "
                f"({prev.spark.__module__}.{prev.spark.__qualname__} vs "
                f"{fn.__module__}.{fn.__qualname__})"
            )
        REGISTRY[name] = DeclaredQuery(
            name=name,
            spark=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
            bench=bench,
        )
        return fn

    return wrap


_MODULES = (
    "blockchaintoavro_spark.plans.relational",
    "blockchaintoavro_spark.plans.blocks_queries",
    "blockchaintoavro_spark.plans.extended",
)


def load_all() -> dict[str, DeclaredQuery]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _MODULES:
        importlib.import_module(mod)
    return REGISTRY
