"""Token-array validation and normalization — vectorized, Arrow-batched.

The reference validates per record in a serial Go loop and aborts the
sync on the first malformed message
(/root/reference/internal/connector/destination.go:396-400). Our engine
validates in bulk: JVM expressions for the cheap structural checks, one
Arrow pandas UDF for the numeric checks Spark can't express natively
(exact int32-range fidelity of every token), and a PERMISSIVE-style
quarantine split instead of aborting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

INT32_MIN = -(2**31)
INT32_MAX = 2**31 - 1


@F.pandas_udf(T.BooleanType())
def _tokens_in_int32_range(tokens: pd.Series) -> pd.Series:
    """True iff every token is a non-null int within int32 range.

    Arrow hands the array column over as a Series of numpy arrays; the
    check is vectorized per batch (np.concatenate + two comparisons),
    no per-row Python in the hot loop.
    """
    n = len(tokens)
    out = np.ones(n, dtype=bool)
    lengths = np.empty(n, dtype=np.int64)
    arrays = []
    for i, arr in enumerate(tokens):
        if arr is None:
            out[i] = False
            lengths[i] = 0
            arrays.append(np.empty(0, dtype=np.float64))
            continue
        a = np.asarray(arr, dtype=np.float64)
        lengths[i] = len(a)
        arrays.append(a)
    if arrays:
        flat = np.concatenate(arrays) if len(arrays) > 1 else arrays[0]
        bad = ~np.isfinite(flat) | (flat < INT32_MIN) | (flat > INT32_MAX) | (flat != np.floor(flat))
        if bad.any():
            # map flat violations back to rows via cumulative lengths
            ends = np.cumsum(lengths)
            bad_idx = np.flatnonzero(bad)
            rows = np.searchsorted(ends, bad_idx, side="right")
            out[rows] = False
    return pd.Series(out)


def validate_tokens(
    df: DataFrame,
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
) -> tuple[DataFrame, DataFrame]:
    """Split df into (valid, quarantined).

    Checks:
      1. tokens is non-null            (JVM)
      2. n_tok == size(tokens)         (JVM)
      3. every token within int32      (Arrow pandas UDF)

    Returns two DataFrames sharing df's schema; `quarantined` carries an
    extra `_reject_reason` column (the reference logs per-event rejects
    without failing the sync, destination.go:485-489 — we route them to
    a table instead).
    """
    checked = df.withColumn(
        "_reject_reason",
        F.when(F.col(tokens_col).isNull(), F.lit("tokens_null"))
        .when(F.col(n_tok_col) != F.size(F.col(tokens_col)), F.lit("n_tok_mismatch"))
        .when(~_tokens_in_int32_range(F.col(tokens_col)), F.lit("token_out_of_int32"))
        .otherwise(F.lit(None)),
    )
    valid = checked.where(F.col("_reject_reason").isNull()).drop("_reject_reason")
    quarantined = checked.where(F.col("_reject_reason").isNotNull())
    return valid, quarantined
