from . import (  # noqa: F401
    dedup,
    filters,
    grouping,
    joins,
    multimodal,
    projections,
    similarity,
)
