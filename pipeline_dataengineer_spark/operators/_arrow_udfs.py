"""Arrow-vectorized pandas UDFs.

NOTE: deliberately no ``from __future__ import annotations`` here —
``pandas_udf`` resolves the type hints at decoration time and cannot
handle stringified annotations.
"""

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def zscore_udf(value: pd.Series, mu: pd.Series, sigma: pd.Series) -> pd.Series:
    """(value - mu) / sigma, NULL where sigma == 0 — the reference
    Arrow-vectorized scalar UDF shape (numpy math over Arrow batches;
    semantics deliberately SQL-expressible so it oracle-checks)."""
    out = (value - mu) / sigma
    return out.where(sigma > 0, other=pd.NA).astype("float64")


def make_winnow_fingerprint_udf(kgram, window):
    """Winnowed local fingerprints (see textstats.rolling_fingerprints
    for rationale): per-position k-gram blake2b hashes, numpy
    sliding-window min, distinct."""
    import re

    ws_re = re.compile(r"\s+")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            if text is None:
                out.append(None)
                continue
            norm = ws_re.sub(" ", text.strip()).lower().encode("utf-8")
            n = max(len(norm) - kgram + 1, 1)
            hashes = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(norm[i : i + kgram], digest_size=8).digest(),
                        "little",
                        signed=True,
                    )
                    for i in range(n)
                ),
                dtype=np.int64,
                count=n,
            )
            if hashes.size <= window:
                mins = np.array([hashes.min()], dtype=np.int64)
            else:
                mins = np.lib.stride_tricks.sliding_window_view(hashes, window).min(
                    axis=1
                )
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return winnow


def make_minhash_band_hash_udf(mults_l, adds_l, num_hashes, bands):
    """Minhash permutation + per-band hashing in numpy (see
    dedup.minhash_band_hashes_arrow for rationale)."""
    mults = np.asarray(mults_l, dtype=np.int64)
    adds = np.asarray(adds_l, dtype=np.int64)
    prime = np.int64((1 << 31) - 1)
    r = num_hashes // bands

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_hash(base: pd.Series) -> pd.Series:
        out = []
        for hashes in base:
            h = np.asarray(hashes, dtype=np.int64) % (1 << 31)
            if h.size == 0:
                sig = np.zeros(num_hashes, dtype=np.int64)
            else:
                # (S, num_hashes) permuted values -> column-wise min
                sig = ((h[:, None] * mults + adds) % prime).min(axis=0)
            bands_out = []
            for b in range(bands):
                digest = hashlib.blake2b(
                    sig[b * r : (b + 1) * r].tobytes(), digest_size=8
                ).digest()
                bands_out.append(int.from_bytes(digest, "little", signed=True))
            out.append(bands_out)
        return pd.Series(out)

    return band_hash
