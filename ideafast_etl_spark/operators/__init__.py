from . import dedup, filters, grouping, joins, projections, similarity  # noqa: F401
