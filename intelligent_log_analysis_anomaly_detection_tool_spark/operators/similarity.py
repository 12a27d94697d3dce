"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  dot product folds inside a single JVM expression (``aggregate(zip_with)``),
  index-order deterministic, no UDF, no explode.
- ``ivf_topk``: the scale path — IVF-style coarse quantization: assign every
  vector to its nearest of C centroids (broadcast join + argmin), search only
  the query's cell (optionally nprobe > 1 cells). At 100 TB the cell
  assignment is a bucketed/partitioned layout; queries touch 1/C of the data.

Cosine is computed in double precision; ties broken by vec_id for
deterministic top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-k against the vector with ``query_vec_id``."""
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("q_vec")
    )
    scored = (
        emb.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), F.col("q_vec")), 4).alias(
                "cosine"
            ),
        )
    )
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)


def cosine_near_dup_pairs(emb: DataFrame, threshold: float = 0.9,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          n_centroids: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold, a < b).

    ``n_centroids=None``: exact brute baseline as BLOCKED MATRIX MULTIPLY —
    the full (normalized) matrix is broadcast (N x dim doubles; brute
    all-pairs is only viable while that fits anyway) and each task multiplies
    its block of rows against it with BLAS via a vectorized mapInPandas
    kernel. With ``n_centroids``: IVF-bucketed variant — only pairs inside
    the same coarse cell are compared (the scale path; recall < 1 by design,
    like every ANN dedup)."""
    if n_centroids:
        cells = assign_cells(emb, emb.filter(F.col(id_col) < n_centroids),
                             id_col, vec_col)
        a = cells.select(F.col(id_col).alias("vec_a"),
                         F.col(vec_col).alias("va"),
                         F.col("centroid_id"))
        b = cells.select(F.col(id_col).alias("vec_b"),
                         F.col(vec_col).alias("vb"),
                         F.col("centroid_id"))
        pairs = a.join(b, "centroid_id").filter(F.col("vec_a") < F.col("vec_b"))
        cos = F.round(cosine_similarity(F.col("va"), F.col("vb")), 4)
        return (
            pairs.withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("vec_a", "vec_b", "cosine")
        )

    import numpy as np
    import pandas as pd

    pdf_all = emb.select(F.col(id_col), F.col(vec_col)).toPandas()
    ids_all = pdf_all[id_col].to_numpy()
    mat = np.array(pdf_all[vec_col].tolist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = emb.sparkSession.sparkContext.broadcast((ids_all, mat))

    def kernel(batches):
        ids_b, m = bc.value
        for pdf in batches:
            block_ids = pdf[id_col].to_numpy()
            block = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            sims = np.round(block @ m.T, 4)
            rows_a, rows_b, rows_c = [], [], []
            for i in range(len(block_ids)):
                mask = (sims[i] >= threshold) & (ids_b > block_ids[i])
                js = np.nonzero(mask)[0]
                if len(js):
                    rows_a.extend([int(block_ids[i])] * len(js))
                    rows_b.extend(int(x) for x in ids_b[js])
                    rows_c.extend(float(x) for x in sims[i][js])
            yield pd.DataFrame(
                {"vec_a": pd.Series(rows_a, dtype="int64"),
                 "vec_b": pd.Series(rows_b, dtype="int64"),
                 "cosine": pd.Series(rows_c, dtype="float64")}
            )

    return emb.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kernel, schema="vec_a long, vec_b long, cosine double"
    )


def assign_cells(emb: DataFrame, centroids: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (broadcast argmin)."""
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec")
    )
    scored = emb.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine_similarity(F.col(vec_col), F.col("c_vec")).alias("c_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("c_sim"), "centroid_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def ivf_topk(emb: DataFrame, query_vec_id: int, k: int = 10, n_centroids: int = 8,
             nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: search only the query's nprobe nearest cells.

    Centroids are the first ``n_centroids`` vectors (deterministic stand-in
    for a k-means pass; the operator shape — assign, prune, rescore — is what
    matters at scale)."""
    centroids = emb.filter(F.col(id_col) < n_centroids)
    cells = assign_cells(emb, centroids, id_col, vec_col)

    q = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("q_vec")
    )
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec")
    )
    probe = (
        c.crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            cosine_similarity(F.col("c_vec"), F.col("q_vec")).alias("c_sim"),
        )
        .orderBy(F.desc("c_sim"), "centroid_id")
        .limit(nprobe)
        .select("centroid_id")
    )
    candidates = cells.join(F.broadcast(probe), "centroid_id").filter(
        F.col(id_col) != query_vec_id
    )
    scored = candidates.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col("q_vec")), 4).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)
