"""Corpus-cleaning heuristics (Gopher / C4 / PII / line-dedup / chunking)
on crafted fixtures where each rule actually fires."""

import hashlib

from pyspark.sql import functions as F

from ideafast_etl_spark.operators import cleaning


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_gopher_rules_fire(spark):
    good = " ".join(["alpha bravo charlie delta echo"] * 12)  # 60 words
    good = good + " the of and that"  # stopword hits
    bullets = "\n".join(["- item one two three four five six seven"] * 10)
    symbols = " ".join(["word###"] * 60)
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols), (4, ""), (5, "tiny doc the of")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in cleaning.gopher_quality(df).collect()}
    assert out[1]["keep"] is True
    assert out[2]["bullet_frac"] == 1.0 and out[2]["keep"] is False
    assert out[3]["symbol_ratio"] > 0.1 and out[3]["keep"] is False
    assert out[4]["words"] == 0 and out[4]["keep"] is False
    assert out[5]["words"] == 4 and out[5]["keep"] is False  # < 50 words
    # stop_hits counts distinct stopword kinds, not occurrences
    assert out[1]["stop_hits"] == 4  # the, of, and, that


def test_c4_line_filter_semantics(spark):
    text = "\n".join(
        [
            "This line has five good words.",   # kept
            "short line.",                       # < 5 words
            "No terminal punctuation here at all",  # no .!?
            "Enable javascript to view this page.",  # javascript
            "var x = {a: 1}; this has braces here.",  # brace
            "Another fine sentence with enough words!",  # kept
            'He said "stop right there now."',  # kept (quote after period)
        ]
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = cleaning.c4_clean(df).first()
    assert r["n_lines"] == 7
    assert r["n_kept"] == 3
    expect = "\n".join(
        [
            "This line has five good words.",
            "Another fine sentence with enough words!",
            'He said "stop right there now."',
        ]
    )
    assert r["clean_md5"] == _md5(expect)
    assert r["keep_doc"] is True
    lorem = "\n".join(["A proper sentence with five words."] * 3) + "\nlorem ipsum dolor"
    r2 = cleaning.c4_clean(
        spark.createDataFrame([(2, lorem)], ["doc_id", "text"])
    ).first()
    assert r2["n_kept"] == 3 and r2["keep_doc"] is False


def test_pii_redaction_counts_and_bytes(spark):
    text = (
        "mail bob@example.com or alice.smith+x@sub.domain.org, "
        "call 555-867-5309, ssn 123-45-6789, host 10.0.0.1 done"
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = cleaning.pii_redaction(df).first()
    assert (r["n_email"], r["n_ip"], r["n_ssn"], r["n_phone"]) == (2, 1, 1, 1)
    expect = (
        "mail <EMAIL> or <EMAIL>, call <PHONE>, ssn <SSN>, host <IP> done"
    )
    assert r["redacted_md5"] == _md5(expect)


def test_pii_no_hits_identity(spark):
    df = spark.createDataFrame([(1, "clean text only")], ["doc_id", "text"])
    r = cleaning.pii_redaction(df).first()
    assert r["redacted_md5"] == _md5("clean text only")
    assert r["n_email"] == r["n_ip"] == r["n_ssn"] == r["n_phone"] == 0


def test_line_dedup_first_occurrence_wins(spark):
    d1 = "shared boilerplate line\nunique to one\n\nanother one-only line"
    d2 = "shared boilerplate line\nunique to two"
    d3 = "shared boilerplate line"  # every line a dup -> doc vanishes
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r.asDict() for r in cleaning.line_dedup(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_kept"] == 4  # all lines incl. the blank one
    assert out[1]["text_md5"] == _md5(d1)
    assert out[2]["n_kept"] == 1
    assert out[2]["text_md5"] == _md5("unique to two")


def test_blank_lines_never_deduped(spark):
    df = spark.createDataFrame(
        [(1, "a.\n\nb."), (2, "c.\n\nd.")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["n_kept"] for r in cleaning.line_dedup(df).collect()}
    assert out == {1: 3, 2: 3}  # both docs keep their blank line


def test_doc_chunks_overlap_and_tail(spark):
    words = [f"w{i}" for i in range(100)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(
        cleaning.doc_chunks(df).collect(), key=lambda r: r["chunk_id"]
    )
    # starts at 0, 48, 96 for n=100
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert [r["n_words"] for r in rows] == [64, 52, 4]
    assert rows[0]["chunk_md5"] == _md5(" ".join(words[0:64]))
    assert rows[1]["chunk_md5"] == _md5(" ".join(words[48:100]))
    assert rows[2]["chunk_md5"] == _md5(" ".join(words[96:100]))


def test_doc_chunks_empty_doc_dropped(spark):
    df = spark.createDataFrame([(1, "   "), (2, "one two")], ["doc_id", "text"])
    rows = cleaning.doc_chunks(df).collect()
    assert [r["doc_id"] for r in rows] == [2]
    assert rows[0]["n_words"] == 2


def test_cleaning_matches_duckdb_twin_on_crafted_docs(spark):
    """Differential check on crafted multi-line/PII docs (the sf fixtures are
    single-line, so the driver's oracle never exercises these branches)."""
    import duckdb

    import __spark_entry__ as entry

    docs = [
        (1, "This line has five good words.\n- bullet\nmail a@b.co now..."),
        (2, "shared line here okay now.\nEnable javascript now here ok.\n"),
        (3, "shared line here okay now.\ncall 555-867-5309 or 10.0.0.1 now."),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    con = duckdb.connect()
    con.register(
        "documents",
        __import__("pandas").DataFrame(docs, columns=["doc_id", "text"]),
    )
    sqls = entry.oracle_sql()
    for name, fn in [
        ("gopher_quality", cleaning.gopher_quality),
        ("c4_line_filter", cleaning.c4_clean),
        ("pii_redaction", cleaning.pii_redaction),
        ("line_dedup_first_wins", cleaning.line_dedup),
        ("doc_chunks", cleaning.doc_chunks),
    ]:
        got = fn(df).toPandas()
        want = con.execute(sqls[name]).df()
        got = got.reindex(sorted(got.columns), axis=1).sort_values(
            by=list(sorted(got.columns)), ignore_index=True
        )
        want = want.reindex(sorted(want.columns), axis=1).sort_values(
            by=list(sorted(want.columns)), ignore_index=True
        )
        assert got.shape == want.shape, name
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (name, c)


def test_char_entropy_values(spark):
    import math

    from ideafast_etl_spark.operators.cleaning import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r.asDict() for r in char_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["uniq_chars"] == 1
    assert abs(out[2]["entropy"] - 1.0) < 1e-6  # two equi-probable chars
    assert abs(out[3]["entropy"] - 2.0) < 1e-6  # four equi-probable chars
    # empty text splits to [''] -> one symbol, entropy 0
    assert out[4]["entropy"] == 0.0 and out[4]["n_chars"] == 1
    # repetitive text scores below diverse text of the same length
    assert out[1]["entropy"] < out[3]["entropy"]
