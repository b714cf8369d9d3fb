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
