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


def make_shingle_minhash_arrow_fn(mults_l, adds_l, shingle_n, num_hashes, bands):
    """mapInArrow variant of ``make_shingle_minhash_udf``: identical
    per-document numpy kernel, but batches flow as Arrow RecordBatches
    with NO pandas layer — building the result as ``pa.array`` of
    int64 ndarrays skips the Series-of-objects conversion the
    pandas_udf return path pays (measured at sf0.1, 10k docs:
    signature stage write 1.3 s → 0.95 s warm, 4.3 s → 1.1 s cold).
    Expects input batches with columns (__id, __text); yields
    (__id, __sh, __bands)."""
    import pyarrow as pa

    if shingle_n > 8:
        raise ValueError("packed shingle codes require shingle_n <= 8")
    mults = np.asarray(mults_l, dtype=np.int64)
    adds = np.asarray(adds_l, dtype=np.int64)
    prime = np.int64((1 << 31) - 1)
    r = num_hashes // bands
    powers = (np.int64(256) ** np.arange(shingle_n)).astype(np.int64)

    def fn(batches):
        for batch in batches:
            ids = batch.column("__id")
            sh_out, band_out = [], []
            for t in batch.column("__text"):
                text = t.as_py()
                if text is None:
                    sh_out.append(None)
                    band_out.append(None)
                    continue
                raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                b = np.where((raw >= 65) & (raw <= 90), raw + 32, raw)
                if b.size < shingle_n:
                    b = np.pad(b, (0, shingle_n - b.size))
                win = np.lib.stride_tricks.sliding_window_view(b, shingle_n)
                codes = np.unique(win.astype(np.int64) @ powers)
                sh_out.append(codes)
                base = codes % (1 << 31)
                sig = ((base[:, None] * mults + adds) % prime).min(axis=0)
                band_arr = np.empty(bands, dtype=np.int64)
                for bi in range(bands):
                    digest = hashlib.blake2b(
                        sig[bi * r : (bi + 1) * r].tobytes(), digest_size=8
                    ).digest()
                    band_arr[bi] = int.from_bytes(digest, "little", signed=True)
                band_out.append(band_arr)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(sh_out, type=pa.list_(pa.int64())),
                    pa.array(band_out, type=pa.list_(pa.int64())),
                ],
                names=["__id", "__sh", "__bands"],
            )

    return fn


def make_shingle_minhash_udf(mults_l, adds_l, shingle_n, num_hashes, bands):
    """text → {sh: array<long> distinct shingle codes,
               bands: array<long> LSH band hashes} — fully vectorized.

    Shingling, minhashing and banding all happen in numpy on the byte
    level: for shingle_n ≤ 8 each k-gram packs injectively into an
    int64 (base-256 positional code), so no string hashing is needed
    at all. The JVM higher-order-function formulation (substr
    transform + xxhash64 per shingle) is interpreted per element and
    measured ~6s/10k docs; this path is ~0.5s.
    """
    if shingle_n > 8:
        raise ValueError("packed shingle codes require shingle_n <= 8")
    mults = np.asarray(mults_l, dtype=np.int64)
    adds = np.asarray(adds_l, dtype=np.int64)
    prime = np.int64((1 << 31) - 1)
    r = num_hashes // bands
    powers = (np.int64(256) ** np.arange(shingle_n)).astype(np.int64)

    schema = T.StructType(
        [
            T.StructField("sh", T.ArrayType(T.LongType()), True),
            T.StructField("bands", T.ArrayType(T.LongType()), True),
        ]
    )

    @F.pandas_udf(schema)
    def shingle_minhash(texts: pd.Series) -> pd.DataFrame:
        sh_out, band_out = [], []
        for text in texts:
            if text is None:
                sh_out.append(None)
                band_out.append(None)
                continue
            raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
            # ASCII lowercase (parity with lower(); non-ASCII bytes pass through)
            b = np.where((raw >= 65) & (raw <= 90), raw + 32, raw)
            if b.size < shingle_n:
                b = np.pad(b, (0, shingle_n - b.size))
            win = np.lib.stride_tricks.sliding_window_view(b, shingle_n)
            codes = np.unique(win.astype(np.int64) @ powers)
            # keep numpy arrays (NOT .tolist()): Arrow converts an
            # int64 ndarray per element-buffer memcpy, while a Python
            # list converts object-by-object (measured ~2s/10k docs
            # just in the return path).
            sh_out.append(codes)
            base = codes % (1 << 31)
            sig = ((base[:, None] * mults + adds) % prime).min(axis=0)
            band_arr = np.empty(bands, dtype=np.int64)
            for bi in range(bands):
                digest = hashlib.blake2b(
                    sig[bi * r : (bi + 1) * r].tobytes(), digest_size=8
                ).digest()
                band_arr[bi] = int.from_bytes(digest, "little", signed=True)
            band_out.append(band_arr)
        return pd.DataFrame({"sh": sh_out, "bands": band_out})

    return shingle_minhash


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


def demean_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas grouped-map: subtract the group mean."""
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "centered": pdf["value"] - pdf["value"].mean(),
        }
    )


def big_orders_batches(batches):
    """mapInPandas: filter + derived column per Arrow batch."""
    for pdf in batches:
        big = pdf[pdf["o_totalprice"] > 100000]
        yield pd.DataFrame(
            {
                "o_orderkey": big["o_orderkey"],
                "o_totalprice": big["o_totalprice"],
                "price_k": big["o_totalprice"] / 1000.0,
            }
        )


def _jaro_winkler_py(a: str, b: str) -> float:
    """Pure-Python Jaro-Winkler kernel (DuckDB-convention: window
    max(|a|,|b|)//2-1 floored at 0, FLOOR-halved transpositions, 0.7
    boost threshold, p=0.1, prefix cap 4)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(max(la, lb) // 2 - 1, 0)
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        ca = a[i]
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and b[j] == ca:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    bs = [b[j] for j in range(lb) if mb[j]]
    t = (
        sum(
            1
            for ca, cb in zip((a[i] for i in range(la) if ma[i]), bs)
            if ca != cb
        )
        // 2
    )
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro > 0.7:
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca != cb:
                break
            prefix += 1
        return jaro + prefix * 0.1 * (1.0 - jaro)
    return jaro


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(col1: pd.Series, col2: pd.Series) -> pd.Series:
    out = []
    for a, b in zip(col1, col2):
        if a is None or b is None:
            out.append(None)
        else:
            out.append(_jaro_winkler_py(a, b))
    return pd.Series(out, dtype="float64")
