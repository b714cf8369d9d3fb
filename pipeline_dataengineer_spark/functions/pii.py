"""PII scrubbing for training corpora — JVM-side regex redaction.

A 100 TB text pipeline must scrub emails, URLs, IPs and phone numbers
before training. All patterns live in the common Java-regex / RE2
subset (no lookbehind, no backrefs) so the same pattern string runs
identically in Spark (`regexp_replace`, global by default) and in any
RE2-based oracle engine with a 'g' flag. Everything is a narrow
projection — codegen'd, zero shuffles, scales linearly.

North-star text-analysis extension; the reference's only string
surgery is accent-stripping and merging
(``src/kafka_client/transformations.py:44-48,6-21``) — redaction
generalizes the same "row-local string rewrite" category.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col

# Order matters: URLs first (they may embed @ or digits), then emails,
# then phones (anchored on a leading +), then bare IPv4s.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d[\d\- ]{6,}\d"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

REDACTIONS: list[tuple[str, str]] = [
    (URL_RE, "<URL>"),
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace every URL/email/phone/IPv4 occurrence with a typed
    placeholder token. One fused projection — Catalyst collapses the
    four regexp_replace calls into a single codegen stage."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in REDACTIONS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(col: Column | str) -> Column:
    """struct(n_urls, n_emails, n_phones, n_ips) — audit counts for a
    redaction report, computed without materializing the matches."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        F.size(F.regexp_extract_all(c, F.lit(URL_RE), F.lit(0))).cast("long").alias("n_urls"),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
        F.size(F.regexp_extract_all(c, F.lit(IPV4_RE), F.lit(0))).cast("long").alias("n_ips"),
    )


def pseudonymize(col: Column | str, salt: str, prefix: str = "id_") -> Column:
    """Deterministic keyed tokenization: value → ``prefix`` + first 16
    hex chars of sha256(salt || value). The GDPR-grade middle ground
    between redaction (loses joinability) and plaintext: the same
    input under the same salt always maps to the same token, so
    joins/groupBys on the pseudonym still work across tables and
    days, while reversal requires the salt. NULL stays NULL.

    Pure codegen projection (sha2 + substr + concat) — rides the
    scan, portable to any engine with sha256."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull(),
        F.concat(
            F.lit(prefix),
            F.substring(F.sha2(F.concat(F.lit(salt), c.cast("string")), 256), 1, 16),
        ),
    )


def normalize_email(col: Column | str) -> Column:
    """Canonical email for identity matching: lowercase, strip a
    ``+tag`` suffix from the local part, and collapse gmail's
    dots-in-local-part equivalence (gmail.com/googlemail.com only —
    dots are significant at other providers). One fused codegen
    regexp chain, NULL-safe; a value without exactly one ``@`` comes
    back NULL (not silently passed through — half an email is not an
    identity key). Java-regex/RE2-portable patterns, same contract
    as functions/html.py."""
    c = F.lower(F.trim(_c(col)))
    valid = c.rlike("^[^@]+@[^@]+$")
    local = F.regexp_extract(c, "^([^@]+)@", 1)
    domain = F.regexp_extract(c, "@([^@]+)$", 1)
    local = F.regexp_replace(local, r"\+.*$", "")
    is_gmail = domain.isin("gmail.com", "googlemail.com")
    local = F.when(is_gmail, F.regexp_replace(local, r"\.", "")).otherwise(
        local
    )
    domain = F.when(is_gmail, F.lit("gmail.com")).otherwise(domain)
    out = F.concat(local, F.lit("@"), domain)
    return F.when(valid & (F.length(local) > 0), out)


def normalize_phone(col: Column | str, default_cc: str = "1") -> Column:
    """Canonical E.164-ish phone for identity matching: strip every
    non-digit, drop one leading international-access ``00``, and
    prefix ``default_cc`` when the remainder looks like a national
    number (10 digits). Results shorter than 8 or longer than 15
    digits come back NULL (ITU E.164 bounds) — garbage must not
    become a join key. Pure codegen, no UDF."""
    raw = F.trim(_c(col).cast("string"))
    # a number that arrived with +CC or 00-international access
    # already carries its country code — never re-prefix those
    had_cc = raw.rlike("^(\\+|00)")
    digits = F.regexp_replace(raw, r"[^0-9]", "")
    digits = F.when(had_cc, F.regexp_replace(digits, "^00", "")).otherwise(
        digits
    )
    with_cc = F.when(
        ~had_cc & (F.length(digits) == 10),
        F.concat(F.lit(default_cc), digits),
    ).otherwise(digits)
    ok = (F.length(with_cc) >= 8) & (F.length(with_cc) <= 15)
    return F.when(ok, F.concat(F.lit("+"), with_cc))


# ------------------------------------------------------------ crypto-shredding


def make_key_table(ids: DataFrame, id_col: str, path: str | None = None) -> DataFrame:
    """One fresh random AES-256 key per entity (32 hex chars = a
    32-byte string key; Spark's aes_encrypt accepts 16/24/32-byte
    keys). Keys are
    intentionally NON-deterministic (uuid-seeded): a derivable key
    could be re-derived after deletion, which would defeat the whole
    scheme.

    MATERIALIZATION IS PART OF THE CONTRACT. A lazy uuid()-seeded
    plan re-generates DIFFERENT keys on every re-evaluation (shuffle
    file loss, executor decommission, plan re-derivation) — ciphertext
    written under one evaluation would become permanently
    undecryptable against a key table persisted from another. So this
    function pins the keys before returning:

    - ``path`` given (STRONGLY recommended for production): the key
      table is written to parquet there and the RE-READ DataFrame is
      returned — durable under any recomputation. Store it separately
      from the data (different ACLs).
    - no ``path``: the result is eagerly ``localCheckpoint``-ed —
      stable within this session, but lost with it; session-scoped
      use (tests, exploratory runs) only.
    """
    keys = ids.select(id_col).distinct().withColumn(
        "key",
        F.sha2(
            F.concat(F.expr("uuid()"), F.col(id_col).cast("string")), 256
        ).substr(1, 32),
    )
    if path is not None:
        keys.write.mode("overwrite").parquet(path)
        return ids.sparkSession.read.parquet(path)
    return keys.localCheckpoint(eager=True)


def encrypt_columns(
    df: DataFrame, keys: DataFrame, id_col: str, cols: list[str]
) -> DataFrame:
    """Crypto-shredding, encrypt side: each entity's sensitive columns
    are AES-GCM-encrypted (Spark's JVM ``aes_encrypt``) under that
    entity's own key from ``keys``. Erasure becomes O(1) per entity:
    DELETE the key row (``shred_keys``) and every copy of the
    ciphertext — warehouse, backups, downstream parquet — is
    unreadable, no rewrite of any data file. The inner join drops
    rows with no key (fail-closed: plaintext never passes through
    unencrypted). Join is dimension-shaped (one key row per entity);
    AQE broadcasts when it fits."""
    out = df.join(keys.select(id_col, "key"), id_col)
    for c in cols:
        out = out.withColumn(
            c, F.base64(F.aes_encrypt(F.col(c).cast("string"), F.col("key")))
        )
    return out.drop("key")


def decrypt_columns(
    df: DataFrame, keys: DataFrame, id_col: str, cols: list[str]
) -> DataFrame:
    """Decrypt side: LEFT join — entities whose key was shredded
    yield NULL for every encrypted column (the data is cryptographic
    garbage without the key, which is the point), all other columns
    intact. ``try_aes_decrypt`` keeps corrupt/foreign ciphertexts
    NULL instead of failing the job."""
    out = df.join(keys.select(id_col, "key"), id_col, "left")
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col("key").isNotNull(),
                F.expr(
                    f"try_aes_decrypt(unbase64({c}), key)"
                ).cast("string"),
            ),
        )
    return out.drop("key")


def shred_keys(keys: DataFrame, ids: DataFrame, id_col: str) -> DataFrame:
    """Forget entities: the new key table without their rows (pair
    with snapshot-table publish for an auditable erasure event)."""
    return keys.join(ids.select(id_col).distinct(), id_col, "left_anti")
