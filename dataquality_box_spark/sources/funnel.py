"""Funnel (chained) extraction: a toposorted DAG of dependent extractions.

Re-expression of the reference's UniversalLoader (reference:
plugins/operators/loader.py:70-163 topological sort; :290-363 batch
``{{ ref.values('col') }}`` -> SQL IN-list and per_row modes;
plugins/infra/extractors/base.py:13-57 UpstreamRef). The Spark-idiomatic
replacement for both modes is a LEFT SEMI JOIN against the upstream's
key set — Catalyst pushes it into the scan (dynamic partition pruning on
partitioned sources), and the per_row anti-pattern disappears entirely.

An extraction node is (name, build, depends) where ``build`` receives the
SparkSession plus the already-built upstream DataFrames.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class FunnelConfigError(ValueError):
    pass


@dataclass
class Extraction:
    name: str
    build: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    depends: tuple[str, ...] = field(default_factory=tuple)


def toposort(extractions: list[Extraction]) -> list[Extraction]:
    """Kahn toposort with cycle/missing-dep detection
    (reference: loader.py:120-163)."""
    by_name = {e.name: e for e in extractions}
    if len(by_name) != len(extractions):
        raise FunnelConfigError("duplicate extraction names")
    for e in extractions:
        for d in e.depends:
            if d not in by_name:
                raise FunnelConfigError(f"{e.name} depends on unknown {d!r}")
    indeg = {e.name: len(e.depends) for e in extractions}
    out: list[Extraction] = []
    ready = sorted(n for n, d in indeg.items() if d == 0)
    while ready:
        n = ready.pop(0)
        out.append(by_name[n])
        for e in extractions:
            if n in e.depends:
                indeg[e.name] -= 1
                if indeg[e.name] == 0:
                    ready.append(e.name)
        ready.sort()
    if len(out) != len(extractions):
        cyc = [n for n, d in indeg.items() if d > 0]
        raise FunnelConfigError(f"cycle among {cyc}")
    return out


def run_funnel(
    spark: SparkSession, extractions: list[Extraction]
) -> dict[str, DataFrame]:
    """Build every extraction in dependency order; returns name -> frame."""
    frames: dict[str, DataFrame] = {}
    for e in toposort(extractions):
        frames[e.name] = e.build(spark, {d: frames[d] for d in e.depends})
    return frames


def semi_join_pushdown(df: DataFrame, upstream: DataFrame, key: str) -> DataFrame:
    """The batch-mode ``{{ ref.values(col) }}`` -> IN-list, done right:
    keep rows whose key appears upstream (reference: loader.py:290-309)."""
    return df.join(upstream.select(key).distinct(), on=key, how="left_semi")
