"""Cross-engine deterministic hashing.

The reference keys everything on SHA1(x) mod 2^m (core_process_utils.go:2535-2577
in the reference repo). We need hashes that produce IDENTICAL values in Spark and
in the DuckDB oracle, so dedup/fingerprint queries can be hash-verified. Spark's
`hash()` (murmur3) and DuckDB's `hash()` differ, so we standardize on:

    h(s) = int(md5(s)[:K_hex], 16)        # both engines have md5 → hex

K_hex=15 → 60-bit hash (collision-safe id space), K_hex=7 → 28-bit hash (safe to
multiply by 31-bit constants inside int64 for MinHash permutations).

Scale note: md5 is a JVM-intrinsic expression in Spark (whole-stage codegen,
no Python), so this stays on the fast path at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1; permutation constants must keep a*h+b within int64:
# h < 2^28, a < 2^31 → a*h < 2^59.
MINHASH_PRIME = 2147483647


def md5_int60(col: Column) -> Column:
    """60-bit integer hash of a string column, identical to DuckDB's
    ('0x' || substr(md5(s),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def md5_int60_py(s: str) -> int:
    """Driver-side Python twin of md5_int60 — the SAME 60-bit value for the
    same string, so a small-list code path can derive hash identities (e.g.
    delete_docs' takedown idempotency token) without a Spark job and still
    agree with the DataFrame path. Kept beside the Spark expression so the
    two definitions cannot drift apart (equivalence pinned in
    tests/test_custom_ops.py)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def md5_int28(col: Column) -> Column:
    """28-bit integer hash (for MinHash permutation arithmetic)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 7), 16, 10).cast("bigint")


def minhash_perm_constants(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a_i*x + b_i) mod P.

    Derived from md5 of the permutation index so Spark and DuckDB can both
    reproduce them (they are just literals baked into the plans).
    """
    import hashlib

    out = []
    for i in range(num_perm):
        a = int(hashlib.md5(f"minhash-a-{i}".encode()).hexdigest()[:7], 16) | 1  # odd, nonzero
        b = int(hashlib.md5(f"minhash-b-{i}".encode()).hexdigest()[:7], 16)
        out.append((a % MINHASH_PRIME or 1, b % MINHASH_PRIME))
    return out


def duckdb_md5_int(expr: str, k_hex: int = 15) -> str:
    """DuckDB SQL fragment matching md5_int60/md5_int28 for a SQL expression."""
    return f"(('0x' || substr(md5({expr}), 1, {k_hex}))::BIGINT)"
