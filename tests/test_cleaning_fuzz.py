"""Randomized cross-engine differential test for the cleaning heuristics:
generated texts (newlines, quotes, unicode, PII-ish fragments) run through
the Spark operators AND their DuckDB oracles; any Java-vs-RE2 regex or
collation divergence fails here before the driver's oracle ever sees it."""

import random
import string

import duckdb
import pandas as pd

import __spark_entry__ as entry
from ideafast_etl_spark.operators import cleaning

_FRAGMENTS = [
    "word", "the", "of", "and", "that", "have", "with", "be", "to",
    "...", "#", "- bullet", "* item", "• dot", "…",
    "Sentence ends here.", "no terminal", "ok!", "what?", 'quote."',
    "javascript", "JavaScript", "{", "}", "lorem ipsum",
    "a@b.co", "x.y+z@mail.example.org", "10.0.0.1", "999.999.999.999",
    "123-45-6789", "555-867-5309", "555.867.5309", "12-34-56",
    "café", "straße", "İstanbul", "über",
    "42", "3.14", "", " ", "\t",
]


def _random_text(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(0, 6)):
        n = rng.randint(0, 12)
        words = [rng.choice(_FRAGMENTS) for _ in range(n)]
        sep = rng.choice([" ", "  ", " \t "])
        lines.append(sep.join(words))
    return "\n".join(lines)


def test_cleaning_ops_match_oracle_on_random_docs(spark):
    rng = random.Random(20260814)
    docs = [(i, _random_text(rng)) for i in range(120)]
    # a few adversarial extras
    docs += [
        (1000, "\n\n\n"),
        (1001, "." * 100),
        (1002, "a" * 5 + "é" * 5),
        (1003, "- " * 50),
        (1004, "mail a@b.co or 1.2.3.4 via 111-22-3333 at 555-123-4567."),
        (1005, None),  # NULL text: engines must agree on propagation/drops
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    sqls = entry.oracle_sql()
    for name, fn in [
        ("gopher_quality", cleaning.gopher_quality),
        ("c4_line_filter", cleaning.c4_clean),
        ("pii_redaction", cleaning.pii_redaction),
        ("line_dedup_first_wins", cleaning.line_dedup),
        ("doc_chunks", cleaning.doc_chunks),
        ("char_entropy", cleaning.char_entropy),
    ]:
        got = fn(df).toPandas()
        want = con.execute(sqls[name]).df()
        cols = sorted(got.columns)
        got = got.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
        want = want.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
        assert got.shape == want.shape, name
        def same(a, b):
            def isnull(v):
                return v is None or v != v  # None or NaN

            if isnull(a) and isnull(b):  # both NULL (engines agree)
                return True
            return a == b

        for c in cols:
            ga, wa = list(got[c]), list(want[c])
            mism = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(ga, wa))
                if not same(a, b)
            ][:3]
            assert not mism, (name, c, mism)
