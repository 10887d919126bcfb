"""Inferflow re-expressed: a component DAG over DataFrames.

The reference executes a configured component graph with Kahn's algorithm,
one goroutine per ready node, over a shared mutable row matrix
(inferflow/dag-topology-executor/handlers/dag/executor.go:36-98,
initializer.go:15-55; components behind AbstractComponent{Run,
GetComponentName} — models.go:10-17).

Spark already *is* a DAG scheduler: each component becomes a
DataFrame -> DataFrame transformation, the pipeline is function
composition, and Catalyst/the scheduler extract the node parallelism the
reference hand-builds with channels. A topological sort is still done here
(components declare dependencies) so configured graphs — not just linear
chains — run correctly; independent branches become independent subtrees of
one logical plan.

Components mirror the reference's three production node types:
- FeatureComponent   (feature_component.go:31-117): entity-key joins
  against the feature store (J4 entity resolution).
- ExpressionComponent (numerix_component.go:29-88): a registered RPN
  compute over matrix columns (U1).
- ScoringComponent   (predator_component.go:37-100): model scoring over
  assembled features — here a deterministic stub / any Python callable via
  an Arrow-batched pandas_udf (U3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bharatmlstack_spark.functions.expressions import ExpressionEngine


class Component:
    """U2: pluggable DAG node — DataFrame in, DataFrame out. Subclasses
    carry a ``name`` field (dataclasses below)."""

    name: str

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover - interface
        raise NotImplementedError


@dataclass
class FnComponent(Component):
    """Wrap any callable as a component."""

    name: str
    fn: Callable[[DataFrame], DataFrame]

    def apply(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


@dataclass
class FeatureComponent(Component):
    """J4: entity-relationship resolution — assemble the entity key from
    matrix columns and left-join features in (feature_component.go:216-258,
    matrix.go:162-179 GetColumnValuesWithKey).

    ``key_map`` maps feature-table key column -> matrix column, so composite
    keys like (user_id, category) resolve from whatever the matrix calls
    them.
    """

    name: str
    feature_df: DataFrame
    key_map: dict[str, str]
    feature_cols: list[str] | None = None
    broadcast: bool = True

    def apply(self, df: DataFrame) -> DataFrame:
        feats = self.feature_df
        if self.feature_cols is not None:
            feats = feats.select(*self.key_map.keys(), *self.feature_cols)
        # rename feature-table keys to the matrix's column names
        for fk, mk in self.key_map.items():
            if fk != mk:
                feats = feats.withColumnRenamed(fk, mk)
        right = F.broadcast(feats) if self.broadcast else feats
        return df.join(right, on=list(self.key_map.values()), how="left")


@dataclass
class ExpressionComponent(Component):
    """U1: numerix compute node — registered RPN -> output column."""

    name: str
    engine: ExpressionEngine
    compute_id: str

    def apply(self, df: DataFrame) -> DataFrame:
        return self.engine.apply(df, self.compute_id)


@dataclass
class ScoringComponent(Component):
    """U3: model scoring over assembled feature columns.

    ``model`` maps an input-column dict of pandas Series -> pandas Series of
    scores; runs as an Arrow-batched pandas_udf (predict_batch shape). The
    default is the deterministic linear stub used by the oracle tests."""

    name: str
    input_cols: list[str]
    output_col: str = "model_score"
    weights: list[float] | None = None
    model: Callable | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        if self.model is None:
            w = self.weights or [1.0] * len(self.input_cols)
            expr: Column = F.lit(0.0)
            for c, wi in zip(self.input_cols, w):
                expr = expr + F.col(c).cast("double") * F.lit(wi)
            return df.withColumn(self.output_col, expr)

        from pyspark.sql.functions import pandas_udf

        fn = self.model

        def _score(*cols):  # varargs pandas_udf: no type hints (unsupported)
            return fn(*cols)

        udf = pandas_udf(_score, "double")
        return df.withColumn(self.output_col, udf(*[F.col(c) for c in self.input_cols]))


class Pipeline:
    """A configured component DAG (adjacency list), topologically executed
    as DataFrame composition (executor.go:36-98 minus the goroutines —
    Spark's scheduler owns physical parallelism)."""

    def __init__(self) -> None:
        self._components: dict[str, Component] = {}
        self._deps: dict[str, set[str]] = {}

    def add(self, component: Component, depends_on: list[str] | None = None) -> "Pipeline":
        if component.name in self._components:
            raise ValueError(f"duplicate component {component.name!r}")
        for d in depends_on or []:
            if d not in self._components:
                raise ValueError(f"unknown dependency {d!r} for {component.name!r}")
        self._components[component.name] = component
        self._deps[component.name] = set(depends_on or [])
        return self

    def run(self, df: DataFrame) -> DataFrame:
        """Cycle-checked topological execution (initializer.go:15-55 builds
        the same in-degree map; graphlib raises CycleError)."""
        order = list(TopologicalSorter(self._deps).static_order())
        for name in order:
            df = self._components[name].apply(df)
        return df
