"""Distributed exact linear algebra over embedding columns.

The scalable pattern for X^T X (Gram / scatter matrix, d x d) over a
tall-skinny matrix (n rows, d=64 components) is per-partition GEMM
partials: each Arrow batch contributes a d x d integer partial via one
numpy matmul, and the partials sum in a d^2-row aggregate. The shuffle
is O(parts * d^2) regardless of n — this is how every distributed PCA /
whitening / covariance job is shaped (e.g. Spark MLlib's
RowMatrix.computeGramianMatrix, which does the same per-partition BLAS
rank-k update on the JVM side).

Components are quantized to integers (floor(x * SCALE)) BEFORE any
product, so every partial and the final sum are exact 64-bit integers:
order-independent, bit-identical across engines, and overflow-safe by
construction (|q| <= SCALE, so a product is <= SCALE^2 = 1e6 and 2^63
admits ~9e12 rows per (i, j) cell).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SCALE = 1000
GRAM_SCHEMA = "i int, j int, partial long"


def gram_partials(vectors: DataFrame, dim: int) -> DataFrame:
    """Per-batch integer GEMM partials of X^T X over a 1-column
    DataFrame of float arrays; emits upper-triangle (i, j, partial)
    rows with 1-based indices (matching SQL list indexing)."""

    iu = np.triu_indices(dim)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for batch in batches:
            x = np.stack(batch.iloc[:, 0].to_numpy())
            q = np.floor(x.astype(np.float64) * SCALE).astype(np.int64)
            acc += q.T @ q
            seen = True
        if seen:
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype("int32"),
                    "j": (iu[1] + 1).astype("int32"),
                    "partial": acc[iu],
                }
            )

    return vectors.mapInPandas(partials, schema=GRAM_SCHEMA)
