"""ML inference/training hooks.

Reference: predict_random_forest / predict_catboost / predict_probabilities
dispatched from process graphs (OpenEOProcessScriptBuilder.scala:1211-1213,
MLlib RandomForestModel imports :3-13); training happens through Spark MLlib
in the driver stack.

Ours uses pyspark.ml natively (the idiomatic replacement for the reference's
RDD-based mllib): train on a feature-vector DataFrame, broadcast the fitted
model's trees as plain numpy arrays, and run inference inside pandas UDFs so
per-pixel prediction stays vectorized. CatBoost inference needs no runtime:
the public JSON model dump parses into broadcast numpy oblivious trees
evaluated vectorized in a pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.ml.classification import RandomForestClassificationModel, RandomForestClassifier
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_class_random_forest(
    df: DataFrame,
    feature_col: str = "embedding",
    label_col: str = "label",
    num_trees: int = 20,
    max_depth: int = 6,
    seed: int = 42,
) -> RandomForestClassificationModel:
    """openEO fit_class_random_forest analog on an array<float> column."""
    prepped = df.select(
        array_to_vector(F.col(feature_col)).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )
    rf = RandomForestClassifier(
        numTrees=num_trees, maxDepth=max_depth, seed=seed, labelCol="label"
    )
    return rf.fit(prepped)


def predict_random_forest(
    df: DataFrame,
    model: RandomForestClassificationModel,
    feature_col: str = "embedding",
    prediction_col: str = "prediction",
) -> DataFrame:
    """Model inference on an array column (openEO predict_random_forest)."""
    prepped = df.withColumn("features", array_to_vector(F.col(feature_col)))
    out = model.transform(prepped)
    return out.drop("features", "rawPrediction").withColumnRenamed(
        "prediction", prediction_col
    )


def predict_probabilities(
    df: DataFrame,
    model: RandomForestClassificationModel,
    feature_col: str = "embedding",
) -> DataFrame:
    from pyspark.ml.functions import vector_to_array

    prepped = df.withColumn("features", array_to_vector(F.col(feature_col)))
    out = model.transform(prepped)
    return out.withColumn(
        "probabilities", vector_to_array("probability")
    ).drop("features", "rawPrediction", "probability")


def parse_catboost_json(model) -> dict:
    """Parse a CatBoost JSON model dump (the public ``save_model(...,
    format='json')`` layout) into plain numpy arrays for broadcast:
    oblivious trees are (feature_idx[depth], border[depth],
    leaf_values[2^depth]) triples plus scale/bias. No CatBoost runtime
    needed — oblivious trees evaluate with pure vectorized comparisons."""
    import json

    if isinstance(model, str):
        with open(model) as f:
            model = json.load(f)
    trees = []
    for t in model["oblivious_trees"]:
        splits = t["splits"]
        feats = np.array([s["float_feature_index"] for s in splits], dtype=np.int64)
        borders = np.array([s["border"] for s in splits], dtype=np.float64)
        leaves = np.asarray(t["leaf_values"], dtype=np.float64)
        if leaves.size != 2 ** len(splits):
            raise ValueError("leaf_values size != 2^depth (multiclass unsupported)")
        trees.append((feats, borders, leaves))
    sb = model.get("scale_and_bias", [1.0, [0.0]])
    bias = sb[1][0] if isinstance(sb[1], list) else sb[1]
    return {"trees": trees, "scale": float(sb[0]), "bias": float(bias)}


def eval_catboost(parsed: dict, X: np.ndarray) -> np.ndarray:
    """Vectorized oblivious-tree evaluation: leaf index for tree t is
    sum_d (x[f_d] > border_d) << d; raw prediction = scale * sum_t leaf + bias.
    (CatBoost convention: feature value strictly greater than border takes
    the '1' branch.)"""
    raw = np.zeros(X.shape[0], dtype=np.float64)
    for feats, borders, leaves in parsed["trees"]:
        idx = np.zeros(X.shape[0], dtype=np.int64)
        for d in range(len(feats)):
            idx |= (X[:, feats[d]] > borders[d]).astype(np.int64) << d
        raw += leaves[idx]
    return parsed["scale"] * raw + parsed["bias"]


def predict_catboost(
    df: DataFrame,
    model,
    feature_col: str = "embedding",
    prediction_col: str = "prediction",
    output: str = "raw",
) -> DataFrame:
    """openEO predict_catboost (OpenEOProcessScriptBuilder.scala:1212)
    without the CatBoost runtime: the JSON model dump parses into broadcast
    numpy oblivious trees evaluated in an Arrow pandas UDF.
    ``output``: 'raw' (regression / link) or 'probability' (sigmoid)."""
    parsed = parse_catboost_json(model)
    sc = df.sparkSession.sparkContext
    b = sc.broadcast(parsed)
    sigmoid = output == "probability"

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _predict(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64)
        raw = eval_catboost(b.value, X)
        if sigmoid:
            raw = 1.0 / (1.0 + np.exp(-raw))
        return pd.Series(raw)

    return df.withColumn(prediction_col, _predict(F.col(feature_col)))


def rf_to_arrays(model: RandomForestClassificationModel) -> dict:
    """Extract a fitted pyspark.ml random forest into plain numpy arrays
    (per tree: feature/threshold/left/right per node, leaf class-count
    rows) so inference can run inside numpy closures/executors without the
    JVM model — the bridge that lets process graphs dispatch
    predict_random_forest per pixel (OpenEOProcessScriptBuilder.scala:1211).
    Continuous splits only (our features are embeddings)."""
    trees = []
    n_classes = int(model.numClasses)
    for t in model.trees:
        feats: list[int] = []
        thr: list[float] = []
        left: list[int] = []
        right: list[int] = []
        stats: list[list[float]] = []

        def add(node) -> int:
            i = len(feats)
            feats.append(-1)
            thr.append(0.0)
            left.append(-1)
            right.append(-1)
            stats.append([float(x) for x in node.impurityStats().stats()])
            if "InternalNode" in node.getClass().getName():
                sp = node.split()
                feats[i] = int(sp.featureIndex())
                thr[i] = float(sp.threshold())
                left[i] = add(node.leftChild())
                right[i] = add(node.rightChild())
            return i

        add(t._call_java("rootNode"))
        counts = np.asarray(stats, dtype=np.float64)
        probs = counts / counts.sum(axis=1, keepdims=True)
        trees.append(
            {
                "feat": np.asarray(feats, dtype=np.int64),
                "thr": np.asarray(thr, dtype=np.float64),
                "left": np.asarray(left, dtype=np.int64),
                "right": np.asarray(right, dtype=np.int64),
                "probs": probs,
            }
        )
    return {"trees": trees, "n_classes": n_classes}


def eval_random_forest(parsed: dict, X: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized forest inference matching Spark's semantics: per-tree leaf
    class distributions averaged across trees; prediction = argmax (first
    max on ties, like Spark's Vector.argmax). -> (pred[n], probs[n, classes])."""
    n = X.shape[0]
    acc = np.zeros((n, parsed["n_classes"]), dtype=np.float64)
    for t in parsed["trees"]:
        idx = np.zeros(n, dtype=np.int64)
        feat, thr, left, right = t["feat"], t["thr"], t["left"], t["right"]
        while True:
            f = feat[idx]
            internal = f >= 0
            if not internal.any():
                break
            go_left = X[np.arange(n), np.where(internal, f, 0)] <= thr[idx]
            nxt = np.where(go_left, left[idx], right[idx])
            idx = np.where(internal, nxt, idx)
        acc += t["probs"][idx]
    probs = acc / len(parsed["trees"])
    return probs.argmax(axis=1).astype(np.float64), probs
