"""Corpus-prep pipeline (pipeline/corpus.py): stage semantics on crafted
docs where each stage actually removes something."""

from ideafast_etl_spark.pipeline.corpus import corpus_prep_stages

GOOD = (
    "this is a long enough document that should pass the quality gate "
    "because it has plenty of the common stopwords and it keeps going "
    "with more and more words of reasonable shape and the punctuation "
    "is light so the score lands comfortably above the threshold value."
)


def test_stages_remove_what_they_should(spark):
    docs = [
        (1, GOOD),                               # survives everything
        (2, GOOD.upper()),                       # case-variant: unique lines, but collapses at normalised exact dedup (stage 4)
        (3, "shared line\n" + GOOD.replace("document", "article")),  # unique tail survives
        (4, "shared line"),                      # all lines dup'd -> stage 1 drop
        (5, "x! y? z." * 40),                    # junk -> quality drop
        (6, GOOD + " mail me at a@b.co today."), # survives, gets redacted
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["stage"]: (r["n_docs"], r["n_tokens"]) for r in corpus_prep_stages(df).collect()}
    assert out["0_raw"][0] == 6
    assert out["1_line_dedup"][0] == 5          # doc 4 (all lines duplicated) vanished
    assert out["2_quality"][0] == 4             # doc 5 dropped
    assert out["3_pii_redacted"][0] == 4        # redaction drops nothing
    assert out["4_exact_dedup"][0] == 3         # dup of GOOD collapsed
    # redaction shrinks tokens (email -> one token <EMAIL>)
    assert out["3_pii_redacted"][1] < out["2_quality"][1]
    assert all(v[1] > 0 for v in out.values())
