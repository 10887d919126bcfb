from bharatmlstack_spark.pipeline.components import (
    Component,
    ExpressionComponent,
    FeatureComponent,
    FnComponent,
    Pipeline,
    ScoringComponent,
)
from bharatmlstack_spark.pipeline.expansion import expand_pairs, expand_slates

__all__ = [
    "Component",
    "ExpressionComponent",
    "FeatureComponent",
    "FnComponent",
    "Pipeline",
    "ScoringComponent",
    "expand_pairs",
    "expand_slates",
]
