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
    max_queries: int | None = 10_000,
) -> DataFrame:
    """Exact top-k by cosine for each query (default: self-join, excluding
    self-matches). -> (query_id, neighbor_id, cosine, rank).

    This is the O(n*q) exact-rerank PRIMITIVE, not a scale path: total work
    is corpus_rows x query_rows, so it is only safe when the query side is
    small. ``max_queries`` enforces that contract (raises instead of
    launching a planet-sized theta-join); the 10^12-row paths are
    ``lsh_topk`` / ``ivf_topk_det``. Pass ``max_queries=None`` only in
    tests that deliberately sweep the full corpus."""
    base = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"))
    q = (queries or emb).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("va"))
    if max_queries is not None:
        n_q = q.limit(max_queries + 1).count()
        if n_q > max_queries:
            raise ValueError(
                f"cosine_topk_bruteforce: query side has >{max_queries} rows; "
                "this exact primitive is O(corpus x queries) — use lsh_topk or "
                "ivf_topk_det for large query sets, or raise max_queries explicitly."
            )
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


def _quantize_rows(v: pd.Series) -> np.ndarray:
    """(n, dim) float64 of floor(x * 1e6): exact-integer doubles, the shared
    quantization of every deterministic similarity path (see
    hyperplane_buckets). Components stay within +-~1e6, so every dot /
    squared-norm below is an integer-valued double < 2^53 — EXACT under any
    summation order, hence bit-identical between a BLAS matmul here and a
    left-fold SQL aggregate in the DuckDB oracle."""
    V = np.stack(v.to_numpy()).astype(np.float64)
    return np.floor(V * 1_000_000.0)


def _list_score_matrix(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, n_lists) nearest-centroid score 2*q.c - |c|^2 (argmax == argmin of
    squared L2 distance; |q|^2 is constant per row so it is dropped). All
    terms exact integers — see _quantize_rows."""
    return 2.0 * (Q @ C.T) - (C * C).sum(axis=1)


def ivf_centroids_det(
    emb: DataFrame,
    n_lists: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic, SQL-mirrorable coarse quantizer for IVF: seed centroids
    are the ``n_lists`` quantized vectors with the smallest
    (md5(id), id) — an order both Spark and DuckDB compute identically — then
    a FIXED number of Lloyd iterations. Each iteration is one distributed
    assign (Arrow argmax over broadcast centroids) + one groupBy with one
    SUM per dimension; the new centroid component is
    floor(double(sum)/count), exact in both engines while the per-list sum
    stays under 2^53 (quantized components are ~1e6, so that holds to ~1e9
    rows per list; beyond that a production build would keep the sums as
    decimals). Empty lists keep their previous centroid. Returns the final
    (n_lists, dim) integer-valued float64 centroid matrix.

    Only O(n_lists * dim) values ever hit the driver per iteration — the
    same driver<->executor traffic pattern as pyspark.ml KMeans."""
    import math

    qdf = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("e")
    )
    seeds = (
        qdf.select("e", F.md5(F.col("id").cast("string")).alias("h"), "id")
        .orderBy("h", "id")
        .limit(n_lists)
        .collect()
    )
    C = np.floor(np.array([r["e"] for r in seeds], dtype=np.float64) * 1_000_000.0)
    dim = C.shape[1]
    sum_aggs = [
        F.sum(F.floor(F.element_at("e", d + 1) * F.lit(1_000_000.0))).alias(f"s{d}")
        for d in range(dim)
    ]
    for _ in range(iters):
        assigned = qdf.withColumn("list_id", _assign_udf(C)(F.col("e")))
        rows = assigned.groupBy("list_id").agg(F.count("*").alias("n"), *sum_aggs).collect()
        newC = C.copy()
        for r in rows:
            newC[r["list_id"]] = [
                math.floor(float(r[f"s{d}"]) / r["n"]) for d in range(dim)
            ]
        C = newC
    return C


def _assign_udf(C: np.ndarray):
    """Arrow UDF: embedding -> nearest-centroid list id (ties -> smaller id,
    matching ROW_NUMBER ORDER BY score DESC, list_id ASC in the oracle)."""

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        S = _list_score_matrix(_quantize_rows(v), C)
        return pd.Series(np.argmax(S, axis=1).astype(np.int32))

    return _assign


def coarse_of_coarse(C: np.ndarray, n_coarse: int, iters: int = 3):
    """Driver-side deterministic Lloyd over the (n_lists, dim) fine-centroid
    matrix -> ((n_coarse, dim) coarse centroids, (n_lists,) group ids).
    Strided seeds + fixed iterations + the shared exact-integer score, so the
    hierarchy is reproducible. This is the second quantizer level that makes
    10^7-list IVF probes tractable: a probe scores n_coarse + w*avg_group
    centroids instead of all n_lists. O(n_lists * dim) work, all driver-side
    numpy — the same data volume ivf_centroids_det already collects."""
    n_lists = C.shape[0]
    n_coarse = max(1, min(n_coarse, n_lists))
    stride = max(1, n_lists // n_coarse)
    Cc = C[::stride][:n_coarse].astype(np.float64).copy()
    for _ in range(iters):
        g = np.argmax(_list_score_matrix(C, Cc), axis=1)
        for j in range(Cc.shape[0]):
            m = C[g == j]
            if len(m):
                Cc[j] = np.floor(m.mean(axis=0))
    group_of = np.argmax(_list_score_matrix(C, Cc), axis=1).astype(np.int32)
    return Cc, group_of


def _assign_two_level_udf(C: np.ndarray, Cc: np.ndarray, group_of: np.ndarray):
    """Arrow UDF: embedding -> nearest FINE centroid via the coarse
    hierarchy, GUARANTEED identical to the flat argmax (_assign_udf).

    Branch-and-bound with the triangle inequality: a group whose coarse
    centroid is at distance d_g with member radius r_g cannot contain a fine
    centroid closer than d_g - r_g, so its best possible score is
    |q|^2 - max(0, d_g - r_g)^2. Groups are scanned in ascending coarse
    distance; a group is skipped when that upper bound (plus a 1.0 slack —
    scores are exact integers, sqrt rounding error is << 1) cannot reach the
    best score found, and the scan stops when even the global max radius
    cannot. Expected cost per vector: n_coarse coarse scores + the members
    of the first one-to-three groups ~ O(sqrt(n_lists)), against the flat
    path's O(n_lists) — with EXACTNESS kept by the fallback band (ties
    resolve score desc, list asc, matching flat/oracle order)."""
    n_coarse = Cc.shape[0]
    members = [np.where(group_of == j)[0] for j in range(n_coarse)]
    radii = np.zeros(n_coarse)
    for j in range(n_coarse):
        if members[j].size:
            d = C[members[j]] - Cc[j]
            radii[j] = float(np.sqrt((d * d).sum(axis=1).max()))
    nonempty = np.array(
        [j for j in range(n_coarse) if members[j].size], dtype=int
    )
    rmax = float(radii[nonempty].max()) if nonempty.size else 0.0

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        Q = _quantize_rows(v)
        qq = (Q * Q).sum(axis=1)
        Sc = _list_score_matrix(Q, Cc)
        out = np.empty(Q.shape[0], dtype=np.int32)
        for i in range(Q.shape[0]):
            dq = np.sqrt(np.maximum(qq[i] - Sc[i, nonempty], 0.0))
            order = np.argsort(dq, kind="stable")
            best_s, best_id = -np.inf, -1
            for oi in order:
                if qq[i] - max(0.0, dq[oi] - rmax) ** 2 + 1.0 < best_s:
                    break  # every later group is even farther
                g = int(nonempty[oi])
                if qq[i] - max(0.0, dq[oi] - radii[g]) ** 2 + 1.0 < best_s:
                    continue  # this group's band cannot reach the best
                m = members[g]
                s = _list_score_matrix(Q[i : i + 1], C[m])[0]
                j = int(np.lexsort((m, -s))[0])  # score desc, list asc
                if s[j] > best_s or (s[j] == best_s and int(m[j]) < best_id):
                    best_s, best_id = float(s[j]), int(m[j])
            out[i] = best_id
        return pd.Series(out)

    return _assign


def _probe_two_level_udf(
    C: np.ndarray,
    Cc: np.ndarray,
    group_of: np.ndarray,
    n_probe: int,
    coarse_probe: int,
):
    """Arrow UDF: embedding -> n_probe fine list ids via the two-level
    hierarchy (top coarse_probe coarse groups, then score only their member
    fine centroids). Tie order matches the flat probe: score desc, list asc."""
    n_coarse = Cc.shape[0]
    members = [np.where(group_of == j)[0] for j in range(n_coarse)]
    empty = np.array([j for j in range(n_coarse) if members[j].size == 0], dtype=int)

    @pandas_udf("array<int>")
    def _probe(v: pd.Series) -> pd.Series:
        Q = _quantize_rows(v)
        Sc = _list_score_matrix(Q, Cc)
        if empty.size:
            Sc[:, empty] = -np.inf  # never probe memberless groups
        topg = np.argsort(-Sc, axis=1, kind="stable")[:, :coarse_probe]
        out = []
        for i in range(Q.shape[0]):
            cand = np.concatenate([members[j] for j in topg[i]])
            s = _list_score_matrix(Q[i : i + 1], C[cand])[0]
            order = np.lexsort((cand, -s))[:n_probe]  # score desc, list asc
            out.append(cand[order].astype(np.int32))
        return pd.Series(out)

    return _probe


def ivf_topk_det(
    emb: DataFrame,
    k: int = 3,
    n_lists: int = 8,
    n_probe: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    two_level: bool = False,
    n_coarse: int | None = None,
    coarse_probe: int = 2,
    two_level_assign: bool = False,
) -> DataFrame:
    """IVF ANN with the deterministic coarse quantizer (ivf_centroids_det):
    every vector is assigned to its nearest final centroid; every query
    probes its ``n_probe`` nearest lists and reranks exactly (cosine on the
    original floats) within candidates. The ONLY join is the candidate
    equi-join on list_id — probing happens against the broadcast centroid
    matrix inside Arrow batches, so there is no crossJoin anywhere. At
    10^12 rows, size n_lists ~ sqrt(n)/probe-budget (ivf_params_for) so each
    list stays shuffle-partition-sized; here fixtures use small params the
    DuckDB oracle mirrors stage for stage. -> (query_id, neighbor_id,
    cosine, rank).

    ``two_level=True`` switches probing to the hierarchical quantizer
    (coarse_of_coarse): a probe scores n_coarse coarse centroids, then only
    the fine centroids inside its ``coarse_probe`` best groups — the IMI /
    IVF-of-IVF pattern that keeps 10^7-list probes O(sqrt(n_lists)) per
    vector. ``two_level_assign=True`` additionally routes ASSIGNMENT through
    the hierarchy (_assign_two_level_udf) — branch-and-bound with a
    triangle-inequality radius band, so the assignment is provably
    IDENTICAL to the flat argmax while scoring ~O(sqrt(n_lists)) centroids
    per vector (at 10^7 lists flat assignment is otherwise the bottleneck).
    Both levels ship to executors as the same broadcast closure, and the
    candidate join is still the one equi-join on list_id."""
    C = ivf_centroids_det(emb, n_lists, iters, id_col, vec_col)

    Cc = group_of = None
    if two_level or two_level_assign:
        nc = n_coarse or max(1, int(np.ceil(np.sqrt(n_lists))))
        Cc, group_of = coarse_of_coarse(C, nc)
    if two_level:
        _probe = _probe_two_level_udf(C, Cc, group_of, n_probe, coarse_probe)
    else:

        @pandas_udf("array<int>")
        def _probe(v: pd.Series) -> pd.Series:
            S = _list_score_matrix(_quantize_rows(v), C)
            # stable argsort on -S: ties keep ascending list_id, matching the
            # oracle's ORDER BY score DESC, list_id ASC
            order = np.argsort(-S, axis=1, kind="stable")[:, :n_probe].astype(
                np.int32
            )
            return pd.Series(list(order))

    assign = (
        _assign_two_level_udf(C, Cc, group_of)
        if two_level_assign
        else _assign_udf(C)
    )
    assigned = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vb"),
        assign(F.col(vec_col)).alias("list_id"),
    )
    probed = emb.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("va"),
        F.explode(_probe(F.col(vec_col))).alias("list_id"),
    )
    cand = probed.join(assigned, "list_id").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("cosine", F.round(cosine_col("va", "vb"), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_params_for(n_rows: int, target_list_rows: int = 100_000) -> dict:
    """Size IVF to the corpus: n_lists ~ n / target_list_rows keeps each
    inverted list one healthy shuffle partition (the candidate equi-join on
    list_id then never builds an oversized group); n_probe trades recall for
    candidate volume. At 10^12 rows / 100k-target that is 10^7 lists —
    flat probing would score 10^7 centroids per vector, so above
    ``two_level_above`` lists the returned params switch on the hierarchical
    probe (ivf_topk_det(two_level=True), n_coarse ~ sqrt(n_lists)) AND the
    hierarchical exact assignment (two_level_assign=True).

    Per-vector cost model (centroid scores, dim-length dots each):
      flat:      probe n_lists,              assign n_lists
      two-level: probe n_coarse + coarse_probe * n_lists/n_coarse,
                 assign n_coarse + (scanned groups) * n_lists/n_coarse
    with n_coarse = sqrt(n_lists) both probe and assign are
    O(sqrt(n_lists)); assignment stays EXACT (triangle-inequality band, see
    _assign_two_level_udf) so recall semantics never change. The remaining
    10^7-list cost is the ~GB centroid broadcast itself — at that scale C
    should move to a shared-storage side input; the closure keeps the same
    shape."""
    import math

    by_list_size = math.ceil(n_rows / max(1, target_list_rows))
    by_sqrt = int(math.sqrt(max(4, n_rows)))
    n_lists = max(2, min(by_sqrt, max(2, by_list_size)))
    two_level_above = 4096
    p = {"n_lists": n_lists, "n_probe": max(2, n_lists // 8)}
    if n_lists > two_level_above:
        p["two_level"] = True
        p["two_level_assign"] = True
        p["n_coarse"] = max(2, int(math.isqrt(n_lists)))
        p["coarse_probe"] = 2
    return p


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
    # materialize once within this DAG: the self-join would evaluate the
    # signature UDF over the corpus twice (r6; no CacheManager entry, so
    # fresh invocations recompute — see dedup.py for the rationale)
    sigs = sigs.localCheckpoint(eager=False)
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
