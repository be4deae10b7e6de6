"""Approximate-nearest-neighbor similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact; O(n*q) — fine for rerank stages
and small query sets). Scale path: random-hyperplane LSH bucketing — the
candidate join is an equi-join on bucket signature, so at 10^12 rows it
shuffles only per-bucket groups; recall is tuned by bits/tables.

Hyperplanes are deterministic pseudo-random integers from (table, bit, dim)
arithmetic — no RNG state, reproducible in SQL oracles and across runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _cosine_batch_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized cosine, BIT-IDENTICAL to a SQL aggregate left fold
    (and to the DuckDB oracles' list_dot_product): the per-dimension loop
    accumulates in index order, reproducing left-fold IEEE rounding exactly
    (numpy sum/einsum would use pairwise/BLAS order and drift in the last
    ulps — enough to flip a round-to-6dp oracle comparison). ~50x faster
    than an interpreted SQL lambda on the rerank hot path."""
    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    n = A.shape[0]
    dot = np.zeros(n)
    na = np.zeros(n)
    nb = np.zeros(n)
    for d in range(A.shape[1]):
        x, y = A[:, d], B[:, d]
        dot += x * y
        na += x * x
        nb += y * y
    return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))


def cosine_col(va: str, vb: str) -> F.Column:
    """Cosine similarity column over two array<float>/array<double> columns
    (Arrow-vectorized, fold-order-exact). The pandas_udf is created lazily —
    decorating at import time needs an active SparkSession."""
    return pandas_udf(_cosine_batch_fn, "double")(F.col(va), F.col(vb))


def cosine_topk_bruteforce(
    emb: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query (default: self-join, excluding
    self-matches). -> (query_id, neighbor_id, cosine, rank)."""
    base = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"))
    q = (queries or emb).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("va"))
    pairs = (
        q.join(base, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_col("va", "vb"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_coefs(table: int, bit: int, dim: int) -> list[int]:
    """Deterministic pseudo-random hyperplane coefficients, engine-portable:
    r[d] = ((table*31 + bit*131 + d*137) % 17) - 8."""
    return [((table * 31 + bit * 131 + d * 137) % 17) - 8 for d in range(dim)]


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: vectors are k-means-partitioned into
    ``n_lists`` coarse lists; each query probes its ``n_probe`` nearest
    centroids and reranks exactly within those lists. At 10^12 rows the
    candidate join is an equi-join on the list id (never O(n*q)); recall is
    tuned by n_probe/n_lists. Training uses pyspark.ml KMeans (deterministic
    seed). -> (query_id, neighbor_id, cosine, rank)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    prepped = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    km = KMeans(k=n_lists, seed=seed).fit(prepped)
    assigned = km.transform(prepped).select(
        "id", "v", F.col("prediction").alias("list_id")
    )
    centroids = emb.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())],
        ["list_id", "centroid"],
    )
    # each query probes its n_probe closest centroids (by cosine)
    qc = assigned.select(F.col("id").alias("query_id"), F.col("v").alias("va")).crossJoin(
        F.broadcast(centroids)
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("list_id"))
    probes = (
        qc.withColumn("ccos", cosine_col("va", "centroid"))
        .withColumn("prank", F.row_number().over(wq))
        .where(F.col("prank") <= n_probe)
        .select("query_id", "va", "list_id")
    )
    cand = probes.join(
        assigned.select(F.col("id").alias("neighbor_id"), F.col("v").alias("vb"), "list_id"),
        "list_id",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("cosine", F.round(cosine_col("va", "vb"), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_buckets(
    emb: DataFrame,
    bits: int,
    tables: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Explode each vector to its ``tables`` LSH bucket keys:
    -> (id, v, bucket) with bucket = 'table:signature'.

    Signatures are computed in one Arrow batch matmul instead of tables*bits
    interpreted SQL folds. Because components quantize to floor(x*1e6) and
    coefficients are small ints, every dot is an integer-valued double below
    2^53 — EXACT under any summation order, so the BLAS matmul reproduces
    the SQL fold (and the DuckDB oracle) bit for bit."""
    C = np.array(
        [hyperplane_coefs(t, b, dim) for t in range(tables) for b in range(bits)],
        dtype=np.float64,
    )
    prefixes = np.array([f"{t}:" for t in range(tables)])

    @pandas_udf("array<string>")
    def _buckets(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy()).astype(np.float64)
        Q = np.floor(V * 1_000_000.0)
        S = Q @ C.T  # (n, tables*bits), exact
        chars = np.where(S >= 0, "1", "0").reshape(len(V), tables, bits)
        strs = chars[:, :, 0]
        for b in range(1, bits):
            strs = np.char.add(strs, chars[:, :, b])
        full = np.char.add(np.broadcast_to(prefixes, (len(V), tables)), strs)
        return pd.Series(full.tolist())

    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.explode(_buckets(F.col(vec_col))).alias("bucket"),
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: random-hyperplane LSH across ``tables`` hash tables;
    candidates = pairs sharing any (table, signature) bucket; exact cosine
    rerank within candidates. Recall grows with tables, bucket size shrinks
    with bits. The whole algorithm (deterministic hyperplanes + exact-integer
    signatures) is engine-portable, so a SQL oracle can mirror it bucket for
    bucket. -> (query_id, neighbor_id, cosine, rank)."""
    sigs = hyperplane_buckets(emb, bits, tables, dim, id_col, vec_col)
    a = sigs.alias("a")
    b = sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("query_id"),
            F.col("a.v").alias("va"),
            F.col("b.id").alias("neighbor_id"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("cosine", F.round(cosine_col("va", "vb"), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_params_for(
    n_rows: int, target_bucket_rows: int = 1000, recall_tables: int = 8
) -> dict:
    """Size hyperplane-LSH parameters to the corpus: candidate work per
    bucket is O(bucket^2), so ``bits`` grows with log2(n / target_bucket) —
    at 10^12 rows and the default 1k-row target that is ~30 bits, keeping
    every bucket join bounded; recall is then bought back with ``tables``
    (each table is an independent chance to collide). The driver queries use
    small fixture-sized params; THIS is the knob a production pipeline
    derives from its row count."""
    import math

    bits = max(1, math.ceil(math.log2(max(2, n_rows / target_bucket_rows))))
    return {"bits": bits, "tables": recall_tables}
