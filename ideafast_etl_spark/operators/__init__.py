from . import (  # noqa: F401
    dedup,
    filters,
    grouping,
    joins,
    metrics,
    multimodal,
    projections,
    similarity,
    skew,
)
