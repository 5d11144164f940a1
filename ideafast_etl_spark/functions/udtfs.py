"""Python UDTF surface (§2.12, Spark 4): user-defined TABLE functions —
the lateral-join extension point for 1:N row expansion in Python.

This exists to complete the UDF-surface matrix (scalar pandas UDF,
applyInPandas, mapInPandas, applyInPandasWithState, and now UDTF); it is
NOT the production path for tokenization — `posexplode(_tokens(...))` in
operators/dedup.py does the same expansion JVM-side with whole-stage
codegen and is what every declared query uses. Reach for a UDTF only when
the per-row expansion logic genuinely needs Python (a bespoke parser, a
third-party segmenter) and the cost is accepted.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, token: string")
class TokenizeUDTF:
    """Emit (position, token) per whitespace-separated token of the input —
    the UDTF twin of the JVM `posexplode(_tokens(text))` path (same
    normalization: lowercase, whitespace-collapsed)."""

    def eval(self, text: str):  # noqa: ANN201 - framework signature
        if text is None:
            return
        for pos, tok in enumerate(text.lower().split()):
            yield pos, tok


def register_udtfs(spark) -> None:
    """Register all UDTFs for SQL lateral use: ``SELECT t.* FROM docs,
    LATERAL tokenize(text) t``."""
    spark.udtf.register("tokenize", TokenizeUDTF)
