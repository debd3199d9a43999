"""r14 optimization equivalence pins.

Each r14 rewrite claims BIT-identical output to the shape it replaced;
these tests pin that claim on small synthetic frames so a later edit
that breaks the equivalence fails here, not at the driver gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import multimodal as mm
from music_streaming_etl_glue_spark.operators import similarity as sim


def _as_str_rows(df, cols):
    casted = df.select(
        *[F.col(c).cast("string").alias(c) for c in cols]
    ).collect()
    return sorted(tuple(r[c] for c in cols) for r in casted)


def test_unit_vector_inrow_matches_window_unit_embedding(spark):
    """_unit_vector_inrow == the exploded _unit_embedding tail,
    including the zero-norm row and sign boundaries (string-cast
    comparison distinguishes -0.0)."""
    rows = [
        (1, [3, -4, 0, 12]),
        (2, [0, 0, 0, 0]),  # zero norm -> all 0.0
        (3, [1, 1, 1, 1]),
        (4, [-7, 2, 9, -1]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, comps array<long>")
    inrow = df.select(
        "doc_id", mm._unit_vector_inrow(F.col("comps")).alias("embedding")
    ).select("doc_id", F.posexplode("embedding").alias("dim", "val"))
    exploded = mm._unit_embedding(
        df.select(
            "doc_id", F.posexplode("comps").alias("dim", "c")
        ).withColumn("dim", F.col("dim").cast("long"))
    )
    got = _as_str_rows(inrow, ["doc_id", "dim", "val"])
    want = _as_str_rows(exploded, ["doc_id", "dim", "val"])
    assert got == want


def test_recall_from_matches_two_branch_counts(spark):
    """_recall_from's one-pass left-join aggregate == the old
    groupBy-count + left-semi shape, including the zero-hit query."""
    exact = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 12), (1, 20), (1, 21), (2, 30)],
        "query_id long, vec_id long",
    )
    approx = spark.createDataFrame(
        [(0, 11), (0, 12), (1, 99), (2, 31)],  # q1/q2 partial & zero hits
        "query_id long, vec_id long",
    )
    got = {
        r["query_id"]: (r["n_exact"], r["n_hits"], r["recall_at_k"])
        for r in sim._recall_from(exact, approx).collect()
    }
    assert got == {
        0: (3, 2, round(2 / 3, sim.ROUND)),
        1: (2, 0, 0.0),
        2: (1, 0, 0.0),
    }
    # schema contract the oracle twin hashes against
    out = sim._recall_from(exact, approx)
    assert [f.name for f in out.schema.fields] == [
        "query_id",
        "n_exact",
        "n_hits",
        "recall_at_k",
    ]
    assert [f.dataType.simpleString() for f in out.schema.fields[:3]] == [
        "bigint",
        "bigint",
        "bigint",
    ]


def test_knn_join_arrow_scoring_matches_fold(spark):
    """The vectorized knn_join kernel == the old JVM fold shape
    (BNLJ + aggregate(zip_with) scoring) on an awkward little corpus:
    duplicate vectors (rounding-boundary ties), a zero query overlap,
    negative components."""
    rows = [
        (i, [float((i * 7 + d * 3) % 11 - 5) for d in range(8)], 0)
        for i in range(30)
    ]
    # plant exact duplicates to force similarity ties
    rows[20] = (20, rows[5][1], 0)
    rows[21] = (21, rows[6][1], 0)
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    got = sim.knn_join(emb, n_queries=3, k=4)

    # the pre-r14 fold formulation, inline
    norm = F.sqrt(sim._dot(sim._as_double("embedding"), sim._as_double("embedding")))
    data = emb.select(
        "vec_id", sim._as_double("embedding").alias("vec"), norm.alias("norm")
    )
    queries = F.broadcast(
        data.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
        )
    )
    scored = data.join(queries, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        F.round(
            sim._dot(F.col("vec"), F.col("qvec"))
            / (F.col("norm") * F.col("qnorm")),
            sim.ROUND,
        ).alias("similarity"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("vec_id").asc()
    )
    want = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 4)
    )
    cols = ["query_id", "vec_id", "similarity", "rank"]
    assert _as_str_rows(got, cols) == _as_str_rows(want, cols)


def test_knn_join_empty_table_raises_documented_error(spark):
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label long"
    )
    with pytest.raises(ValueError, match="empty"):
        sim.knn_join(emb)


def test_dsir_weight_decimal_multiply_matches_per_occurrence_sum(spark):
    """Σ_b c·λ with the precision-pinned decimal multiply == the old
    per-occurrence decimal addition (exactness of the λ repeat-factor)."""
    from music_streaming_etl_glue_spark.operators import text as T

    lam = spark.createDataFrame(
        [(0, "-1.234567890123"), (1, "5.000000000001"), (2, "-0.000000000007")],
        "b long, lam_s string",
    ).select("b", F.col("lam_s").cast(T._NB_DEC).alias("lam"))
    occ = spark.createDataFrame(
        [(1, 0), (1, 0), (1, 0), (1, 1), (2, 2)] * 17,
        "doc_id long, b long",
    )
    per_occurrence = (
        occ.join(lam, "b").groupBy("doc_id").agg(F.sum("lam").alias("w"))
    )
    cdb = occ.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    multiplied = (
        cdb.join(lam, "b")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("lam").cast("decimal(26,12)")
                * F.col("c").cast("decimal(11,0)")
            ).alias("w")
        )
    )
    got = {
        r["doc_id"]: str(r["w"])
        for r in multiplied.select(
            "doc_id", F.col("w").cast(T._NB_DEC).alias("w")
        ).collect()
    }
    want = {
        r["doc_id"]: str(r["w"])
        for r in per_occurrence.select(
            "doc_id", F.col("w").cast(T._NB_DEC).alias("w")
        ).collect()
    }
    assert got == want


def test_hashed_doc_vectors_scatter_matches_map_rebuild(spark):
    """The Arrow scatter rebuild == the old element_at(map, i) rebuild."""
    from music_streaming_etl_glue_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma", "s"),
            (2, "alpha", "s"),
            (3, "", "s"),
            (4, "x y z x y z x", "s"),
        ],
        "doc_id long, text string, source string",
    )
    dims = 16
    got = T.hashed_doc_vectors(docs, dims)

    # pre-r14 map-rebuild formulation, inline
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(T._tokens(), lambda t: t != F.lit(""))).alias(
            "token"
        ),
    )
    idx = (
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long") % dims
    )
    sign = F.when(
        F.conv(F.substring(F.md5("token"), 32, 1), 16, 10).cast("long") % 2
        == 1,
        F.lit(1),
    ).otherwise(F.lit(-1))
    cells = (
        toks.select("doc_id", idx.alias("d"), sign.alias("s"))
        .groupBy("doc_id", "d")
        .agg(F.sum("s").cast("long").alias("v"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("int")), F.lit(0).cast("long")
        ).cast("double"),
    )
    want = (
        cells.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("d").cast("int"), F.col("v")))
            ).alias("__m")
        )
        .select("doc_id", dense.alias("embedding"))
    )
    cols = ["doc_id", "embedding"]
    assert _as_str_rows(got, cols) == _as_str_rows(want, cols)
