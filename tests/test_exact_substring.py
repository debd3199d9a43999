"""Semantics pins for the ExactSubstr pass (Lee et al. 2022): keep the
FIRST occurrence in corpus order, drop every later one, merge flagged
K-windows into maximal spans, and keep fully-deduplicated docs as empty
rows. K is shrunk to 4 here so the fixtures stay readable; the
production constant (EXACT_SUBSTR_K=20) only changes the window width."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import dedup as D

K = 4
DOC_COLS = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_COLS)


def _spans(spark, rows):
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in D.exact_substring_spans(_docs(spark, rows), K).collect()
    }


def test_later_doc_loses_the_shared_span(spark):
    # docs 1 and 2 share the 6-token run w1..w6 (tokens 2..7 in doc 2);
    # doc 1 is first in corpus order and keeps it
    rows = [
        (1, "w1 w2 w3 w4 w5 w6 x1 x2 x3 x4"),
        (2, "y1 y2 w1 w2 w3 w4 w5 w6 z1 z2"),
    ]
    assert _spans(spark, rows) == {(2, 2, 7, 6)}
    out = {
        r.doc_id: r
        for r in D.exact_substring_dedup(_docs(spark, rows), K).collect()
    }
    assert out[1].n_removed == 0
    assert out[2].n_removed == 6
    assert out[2].clean_text == "y1 y2 z1 z2"


def test_intra_doc_repeat_of_long_span_drops(spark):
    # the same >=K run twice INSIDE one doc: the second copy drops
    rows = [(7, "a1 a2 a3 a4 m1 m2 a1 a2 a3 a4")]
    assert _spans(spark, rows) == {(7, 6, 9, 4)}
    out = D.exact_substring_dedup(_docs(spark, rows), K).head()
    assert out.clean_text == "a1 a2 a3 a4 m1 m2"


def test_fully_duplicated_doc_keeps_an_empty_row(spark):
    rows = [
        (1, "p1 p2 p3 p4 p5"),
        (2, "p1 p2 p3 p4 p5"),
    ]
    out = {
        r.doc_id: r
        for r in D.exact_substring_dedup(_docs(spark, rows), K).collect()
    }
    assert out[1].n_removed == 0
    assert out[2].n_removed == 5 and out[2].clean_text == ""
    assert set(out) == {1, 2}


def test_overlapping_windows_merge_to_one_maximal_span(spark):
    # a shared 7-token run = 4 overlapping K-windows -> ONE span
    rows = [
        (1, "s1 s2 s3 s4 s5 s6 s7"),
        (2, "q1 s1 s2 s3 s4 s5 s6 s7 q2"),
    ]
    assert _spans(spark, rows) == {(2, 1, 7, 7)}


def test_disjoint_shared_runs_stay_separate_spans(spark):
    # two shared K-runs separated by a 2-token unique gap: two islands
    rows = [
        (1, "g1 g2 g3 g4 h1 h2 h3 h4"),
        (2, "g1 g2 g3 g4 u1 u2 h1 h2 h3 h4"),
    ]
    assert _spans(spark, rows) == {(2, 0, 3, 4), (2, 6, 9, 4)}


def test_short_shared_runs_are_ignored(spark):
    # K-1 shared tokens never flag
    rows = [
        (1, "c1 c2 c3 d1 d2 d3 d4"),
        (2, "c1 c2 c3 e1 e2 e3 e4"),
    ]
    assert _spans(spark, rows) == set()
    out = D.exact_substring_dedup(_docs(spark, rows), K)
    assert out.filter(F.col("n_removed") > 0).count() == 0


def test_jvm_only_plan(spark):
    rows = [(1, "w1 w2 w3 w4 w5"), (2, "w1 w2 w3 w4 w5")]
    plan = D.exact_substring_dedup(
        _docs(spark, rows), K
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# hybrid retrieval RRF pins (same r11 batch)
# ---------------------------------------------------------------------------


def test_hybrid_rrf_fuses_both_lists(spark):
    from music_streaming_etl_glue_spark.operators import text as T
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = T.hybrid_retrieval_rrf(docs).collect()
    assert len(out) == T.HYBRID_TOP_K
    lex = {r.doc_id: r.rank for r in T.bm25_scores(docs).collect()}
    sem = {r.doc_id: r.rank for r in T.semantic_query_topk(docs).collect()}
    for r in out:
        expect = 0.0
        if r.doc_id in lex:
            assert r.lex_rank == lex[r.doc_id]
            expect += 1.0 / (T.RRF_K + lex[r.doc_id])
        else:
            assert r.lex_rank is None
        if r.doc_id in sem:
            assert r.sem_rank == sem[r.doc_id]
            expect += 1.0 / (T.RRF_K + sem[r.doc_id])
        else:
            assert r.sem_rank is None
        assert abs(r.rrf_score - round(expect, 6)) < 1e-9
    # fusion actually mixes: the top-20 must contain at least one doc
    # from each single-signal list
    ids = {r.doc_id for r in out}
    assert ids & set(lex) and ids & set(sem)
    # ranks are 1..k by descending fused score
    assert [r.rank for r in out] == sorted(r.rank for r in out)


def test_incremental_scrubs_against_corpus_and_within_batch(spark):
    """Batch-incremental form: corpus (doc_id % mod == 0) text always
    wins; new docs scrub spans seen in the corpus OR earlier among the
    new slice; corpus docs are never emitted."""
    # mod 5: docs 0/5 are corpus, the rest new
    rows = [
        (0, "c1 c2 c3 c4 c5 c6"),          # corpus
        (1, "c1 c2 c3 c4 x1 x2"),          # scrubs the corpus run
        (2, "f1 f2 f3 f4 f5 f6"),          # fresh — keeps everything
        (3, "g1 f1 f2 f3 f4 f5 f6 g2"),    # scrubs against doc 2 (new-vs-new)
        (5, "h1 h2 h3 h4 h5 h6"),          # corpus
    ]
    out = {
        r.doc_id: r
        for r in D.exact_substring_incremental(
            _docs(spark, rows), corpus_mod=5, k=K
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].clean_text == "x1 x2" and out[1].n_removed == 4
    assert out[2].n_removed == 0
    assert out[3].clean_text == "g1 g2" and out[3].n_removed == 6
