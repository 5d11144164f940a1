"""Substring-duplication spans (operators/dedup.py::substring_dup_spans):
island-merge semantics, cross- and within-document repeats, boundaries."""

import pytest

from ideafast_etl_spark.operators.dedup import substring_dup_spans

W = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"  # a 10-token run


@pytest.fixture(scope="module")
def spans_of(spark):
    def run(rows, min_len=5):
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return sorted(
            (r.doc_id, r.span_start, r.span_end, r.n_windows)
            for r in substring_dup_spans(df, min_len=min_len).collect()
        )

    return run


def test_cross_doc_repeat_merges_to_one_span(spans_of):
    # the shared 10-token run yields 6 duplicated 5-windows -> ONE island
    rows = [(0, W + " unique0 tail0 here0 alpha beta"),
            (1, "lead1 other1 " + W + " gamma delta")]
    got = spans_of(rows)
    assert got == [(0, 1, 10, 6), (1, 3, 12, 6)]


def test_within_doc_repeat_detected(spans_of):
    rows = [(0, W + " gap0 gap1 gap2 " + W)]
    got = spans_of(rows)
    # both copies duplicated; islands respect the gap
    assert got == [(0, 1, 10, 6), (0, 14, 23, 6)]


def test_no_duplication_no_rows(spans_of):
    rows = [(0, "a b c d e f g h"), (1, "p q r s t u v w")]
    assert spans_of(rows) == []


def test_short_docs_skipped(spans_of):
    rows = [(0, "x y"), (1, "x y")]
    assert spans_of(rows) == []


def test_adjacent_islands_coalesce(spans_of):
    # doc0 carries run A immediately followed by run B; doc1 has A, doc2 has
    # B -> in doc0 the two duplicated regions are adjacent and merge
    a = "a0 a1 a2 a3 a4"
    b = "b0 b1 b2 b3 b4"
    rows = [(0, a + " " + b), (1, a + " t1 t2 t3 t4 t5"), (2, "s1 s2 s3 s4 s5 " + b)]
    got = spans_of(rows)
    assert (0, 1, 10, 2) in got  # one merged span covering both runs


def test_min_len_boundary(spans_of):
    # exactly min_len shared tokens -> exactly one window, span = the run
    rows = [(0, "c0 c1 c2 c3 c4 x y z w v"), (1, "c0 c1 c2 c3 c4 q r s t u")]
    got = spans_of(rows)
    assert (0, 1, 5, 1) in got and (1, 1, 5, 1) in got


def _python_twin(texts, min_len):
    """Brute-force reference: window counts + island merge in pure python."""
    import re
    from collections import Counter

    toks = {
        i: re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        for i, t in texts
    }
    wins = []
    counts = Counter()
    for i, tk in toks.items():
        for p in range(len(tk) - min_len + 1):
            w = " ".join(tk[p : p + min_len])
            wins.append((i, p + 1, w))
            counts[w] += 1
    dups = sorted((i, p) for i, p, w in wins if counts[w] >= 2)
    out = []
    cur = None
    for i, p in dups:
        end = p + min_len - 1
        if cur and cur[0] == i and p <= cur[2] + 1:
            cur[2] = max(cur[2], end)
            cur[3] += 1
        else:
            if cur:
                out.append(tuple(cur))
            cur = [i, p, end, 1]
    if cur:
        out.append(tuple(cur))
    return sorted(out)


def test_hypothesis_twin(spark):
    from hypothesis import given, settings, strategies as st

    vocab = ["a", "b", "c", "d"]
    doc = st.lists(st.sampled_from(vocab), min_size=1, max_size=30).map(
        " ".join
    )

    @given(docs=st.lists(doc, min_size=1, max_size=5))
    @settings(max_examples=8, deadline=None)
    def run(docs):
        rows = list(enumerate(docs))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = sorted(
            (r.doc_id, r.span_start, r.span_end, r.n_windows)
            for r in substring_dup_spans(df, min_len=4).collect()
        )
        assert got == _python_twin(rows, 4)

    run()
