"""Cross-engine-portable hashing primitives.

The DuckDB oracle gate needs hash values that are IDENTICAL in Spark and
DuckDB. Neither engine's native hash matches the other (Spark: murmur3 /
xxhash64; DuckDB: its own), so we derive a 60-bit integer from the md5 hex
digest — md5 is byte-identical everywhere:

    Spark : conv(substring(md5(s), 1, 15), 16, 10)::bigint
    DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

15 hex chars = 60 bits → always positive, no overflow. MinHash mixes it
with (a·(h mod p) + b) mod p over p = 2^31 − 1, keeping every intermediate
below 2^62 so int64 arithmetic is exact in both engines.

KNOWN LIMIT (documented, deliberate): every universal_hash row reduces the
same x = h mod p, so two items with h ≡ h' (mod 2^31−1) collide in ALL k
rows at once — the family's full-collision floor is 2⁻³¹ per pair instead
of the independent-row ideal. At the sketch parameters shipped here this
is immaterial: CMS's per-row bucket-collision rate is 1/width = 2⁻⁸ and
Bloom's designed fp ≈ 10⁻³, both ~10⁶× larger than 2⁻³¹; for MinHash a
full collision merely merges two shingles (tiny Jaccard perturbation). If
width/m ever grow enough that 2⁻³¹ becomes the binding floor, switch to a
two-coordinate family — x₁ = h mod p, x₂ = (h >> 31) mod p,
(a·x₁ + c·x₂ + b) mod p — and regenerate the SQL twins from the same
constants; every consumer is oracle/fuzz/golden-gated, so the migration
is mechanical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1


def h60(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def h60_sql(expr: str) -> str:
    """Portable 60-bit hash (DuckDB oracle side)."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def h60_spark_sql(expr: str) -> str:
    """The SAME portable 60-bit hash as ``h60``, as a Spark-SQL string —
    for call sites that assemble whole expressions as single-parse SQL
    (one py4j round trip) instead of Column-operator chains. Must stay
    the string twin of ``h60`` above (pinned by test_ext's portable-hash
    equality checks through every consumer)."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def minhash_coeffs(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k universal-hash functions, identical
    on both sides because they're generated here and inlined as literals."""
    coeffs = []
    a, b = seed, seed * 31 + 1
    for _ in range(k):
        a = (a * 1_103_515_245 + 12_345) % (MERSENNE_P - 1) + 1  # a ∈ [1, p-1]
        b = (b * 69_069 + 1) % MERSENNE_P
        coeffs.append((a, b))
    return coeffs


def universal_hash(hcol: Column, a: int, b: int) -> Column:
    """(a·(h mod p) + b) mod p — exact in int64 (Spark side)."""
    return (F.lit(a) * (hcol % MERSENNE_P) + F.lit(b)) % MERSENNE_P


def universal_hash_sql(hexpr: str, a: int, b: int) -> str:
    return f"(({a} * ({hexpr} % {MERSENNE_P}) + {b}) % {MERSENNE_P})"
