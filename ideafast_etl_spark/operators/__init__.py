from . import (  # noqa: F401
    bucketing,
    corpus,
    dedup,
    filters,
    grouping,
    joins,
    layout,
    metrics,
    multimodal,
    projections,
    similarity,
    skew,
)
