"""PCA + standardization (reference M9, plots.py:539-546,619-631).

MLlib StandardScaler + PCA over selected channels; returns the
projected coordinates, the components, and explained variance — the
data behind the reference's pcaplot. Distributed end-to-end; only the
k×d component matrix comes back to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(df: DataFrame, cols: list[str], k: int = 2):
    """Fit standardize+PCA; returns (scaler_model, pca_model,
    explained_variance: list[float])."""
    from pyspark.ml.feature import PCA, StandardScaler, VectorAssembler

    asm = VectorAssembler(
        inputCols=cols, outputCol="__raw", handleInvalid="skip"
    )
    scaler = StandardScaler(
        inputCol="__raw", outputCol="__std", withMean=True, withStd=True
    )
    vec = asm.transform(df)
    scaler_model = scaler.fit(vec)
    std = scaler_model.transform(vec)
    pca = PCA(k=k, inputCol="__std", outputCol="__pc")
    pca_model = pca.fit(std)
    return scaler_model, pca_model, list(pca_model.explainedVariance)


def pca_project(
    df: DataFrame, cols: list[str], k: int = 2, keep: list[str] | None = None
) -> tuple[DataFrame, list[float]]:
    """Project rows onto the first k principal components.

    Returns (projected frame with pc1..pck, explained_variance)."""
    from pyspark.ml.functions import vector_to_array

    scaler_model, pca_model, ev = pca_fit(df, cols, k)
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(inputCols=cols, outputCol="__raw", handleInvalid="skip")
    out = pca_model.transform(scaler_model.transform(asm.transform(df)))
    arr = vector_to_array(F.col("__pc"))
    keep = keep if keep is not None else [c for c in df.columns]
    proj = out.select(
        *keep, *[arr[i].alias(f"pc{i + 1}") for i in range(k)]
    )
    return proj, ev
