"""Arrow-batched pandas UDF factories that need REAL (non-stringified) type
hints.

Most operator modules use ``from __future__ import annotations``, which
stringifies annotations and breaks ``pandas_udf``'s hint-based type
inference for locally imported names. This module deliberately omits the
future import so factories here can use the modern hint-based API instead
of the deprecated ``PandasUDFType`` enum.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def make_bloom_test_udf(bc):
    """Vectorized Bloom bit-test over a broadcast uint64 bitset.

    Input column: array<bigint> of k bit positions (computed JVM-side with
    the same xxhash64 expressions as the build, so hashing can never
    diverge between build and probe). Output: boolean, true iff ALL k bits
    are set. Zero-row batches return an empty boolean Series (np.vstack
    would raise on an empty sequence).
    """

    @F.pandas_udf("boolean")
    def _test(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        w = bc.value
        arr = np.vstack(pos.to_numpy())  # (rows, k) int64 positions
        hit = (
            w[arr >> 6] >> (arr.astype(np.uint64) & np.uint64(63))
        ) & np.uint64(1)
        return pd.Series(hit.all(axis=1))

    return _test
