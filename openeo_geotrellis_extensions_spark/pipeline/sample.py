"""Deterministic sampling for training-data pipelines.

Spark's sample()/sampleBy() draw from a partition-seeded RNG — reproducible
within one Spark build but not portable to other engines or stable across
repartitioning. Training pipelines want content-keyed decisions: the SAME
document keeps/drops regardless of partitioning, cluster size, or engine.

Here the keep decision is ``md5(key || ':' || salt) < threshold(fraction)``:
the digest is uniform over 16^32, so comparing the lowercase-hex string
against a precomputed hex threshold keeps each key independently with the
requested probability — one deterministic Column expression, no RNG state,
mirrorable in any SQL engine with md5 (the DuckDB oracles re-run it
verbatim). Threshold resolution is 16^-8 (~4e-10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _threshold_hex(fraction: float) -> str:
    """32-char lowercase hex string t with P(md5 < t) == round(f * 16^8) / 16^8."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    scaled = round(fraction * 16**8)
    if scaled >= 16**8:
        return "g" * 32  # lexicographically above every hex digest: keep all
    return format(scaled, "08x") + "0" * 24


def keep_expr(key_col: str, fraction: float, salt: str = "sample") -> F.Column:
    """Boolean Column: deterministic keep decision for ``fraction``."""
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{salt}")))
    return digest < F.lit(_threshold_hex(fraction))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Content-keyed Bernoulli sample: stable under repartitioning, engine-
    portable, no RNG."""
    return df.where(keep_expr(key_col, fraction, salt))


def importance_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    target_fraction: float,
    temperature: float = 0.5,
    salt: str = "imp",
    mean_weight: float | None = None,
) -> DataFrame:
    """Temperature-weighted deterministic sampling — the data-mixing
    reweighting step of a curation pipeline: keep probability
    ``p = min(1, target_fraction * w^T / mean(w^T))`` so higher-weight
    (higher-quality) documents survive more often; ``temperature`` T < 1
    flattens the distribution (T=0 degenerates to a uniform Bernoulli at
    ``target_fraction``). The decision stays content-keyed: the doc's md5
    digest is compared against a PER-ROW hex threshold built from p, so the
    same doc keeps/drops regardless of partitioning or engine.

    Scale shape: ONE corpus aggregate (mean of w^T — a broadcast scalar)
    plus a map-only filter; no shuffle of the data itself. Pass a
    pre-computed ``mean_weight`` (mean of w^T) to skip the aggregate and
    make the whole decision a closed-form map-only expression — the form
    the cross-engine oracle pins exactly (a float corpus mean carries
    summation-order ulp drift between engines; a supplied constant does
    not)."""
    if not 0.0 <= target_fraction <= 1.0:
        raise ValueError(f"target_fraction must be in [0, 1], got {target_fraction}")
    w = F.col(weight_col).cast("double")
    # T=0.5 via sqrt, not pow: IEEE sqrt is correctly rounded in every
    # engine, so the decision boundary is bit-identical cross-engine
    wt = (
        F.sqrt(w)
        if temperature == 0.5
        else F.pow(w, F.lit(float(temperature)))
    )
    if mean_weight is None:
        norm = df.select(F.avg(wt).alias("_mean_wt"))
        df = df.crossJoin(F.broadcast(norm))
        mean_col = F.col("_mean_wt")
    else:
        mean_col = F.lit(float(mean_weight))
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{salt}")))
    p = F.least(F.lit(1.0), F.lit(float(target_fraction)) * wt / mean_col)
    scaled = F.floor(p * F.lit(float(16**8))).cast("long")
    thr = F.when(scaled >= 16**8, F.lit("g" * 32)).otherwise(
        F.concat(F.format_string("%08x", scaled), F.lit("0" * 24))
    )
    return df.where(digest < thr).drop("_mean_wt")


def dataset_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test ASSIGNMENT (not a filter): every
    row gets a ``split`` label from disjoint md5 intervals —
    ``[0, f_train) -> train, [f_train, f_train+f_val) -> val, rest ->
    test``. Content-keyed, so the same document lands in the same split
    regardless of partitioning, cluster size, engine, or the order other
    documents arrive in — the property that keeps eval sets
    contamination-stable as the corpus grows (new docs never MOVE old docs
    across splits, unlike randomSplit or any count-based slicing).

    Map-only Column expression: zero shuffle at any scale."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {fractions}")
    if len(fractions) < 2:
        raise ValueError("need at least two splits")
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{salt}")))
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:  # last split takes the remainder interval
        cum += fractions[name]
        branch = F.when(digest < F.lit(_threshold_hex(cum)), F.lit(name))
        expr = branch if expr is None else expr.when(
            digest < F.lit(_threshold_hex(cum)), F.lit(name)
        )
    return df.withColumn("split", expr.otherwise(F.lit(names[-1])))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the sampleBy analog): each stratum
    keeps its own fraction; strata missing from ``fractions`` keep
    ``default_fraction``. One Column expression — no per-stratum jobs, no
    shuffle beyond what the caller already has."""
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{salt}")))
    expr = None
    for stratum, frac in sorted(fractions.items()):
        thr = F.lit(_threshold_hex(frac))
        branch = (F.col(strata_col) == stratum) & (digest < thr)
        expr = branch if expr is None else (expr | branch)
    # NULL-safe fallback: `~isin(...)` is NULL (not true) for a NULL
    # stratum, and WHERE drops NULL — coalesce so unknown AND null strata
    # both take default_fraction
    not_listed = F.coalesce(
        ~F.col(strata_col).isin(*fractions.keys()), F.lit(True)
    )
    fallback = not_listed & (digest < F.lit(_threshold_hex(default_fraction)))
    expr = fallback if expr is None else (expr | fallback)
    return df.where(expr)
