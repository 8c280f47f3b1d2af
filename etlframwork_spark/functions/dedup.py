"""Deduplication for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Everything stays JVM-side (higher-order array functions + xxhash64) —
there is no Python in any per-row path, so the same code scales to a
multi-billion-document corpus: shingling/hashing is map-only, LSH turns
the quadratic pair search into a band-bucket shuffle, and the verify step
joins only within buckets.

Exact dedup and bounded n-gram Jaccard have DuckDB oracles; MinHash/
SimHash use Spark's xxhash64 (no DuckDB twin) so the driver records
rows-only checks and tests/test_dedup.py verifies their quality against
exact Jaccard on small corpora instead.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

from ..operators.registry import query
from ..sources.io import load_table

# deterministic (a, b) constants for the MinHash permutation family.
# 31-bit arithmetic: a*h31 + b stays < 2^62, so Spark's ANSI-mode long
# arithmetic can never overflow (Spark 4 throws on long overflow).
_P = (1 << 31) - 1  # Mersenne prime 2147483647
_RNG = np.random.default_rng(42)
NUM_PERM = 16
_AB = [(int(a), int(b)) for a, b in zip(_RNG.integers(1, _P, NUM_PERM), _RNG.integers(0, _P, NUM_PERM))]
BAND_ROWS = 2  # 8 bands of 2 rows: catches jaccard >~ 0.5 w.h.p.


# ----------------------------------------------------------------- exact dedup
@query(
    "docs_exact_dedup",
    oracle="""
    SELECT sha256(text) AS content_sha, MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
)
def docs_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on sha256(text), keep the smallest id.
    The canonical first pass of any corpus dedup (map-side combine, one
    shuffle on the digest)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.sha2(F.col("text"), 256).alias("content_sha")).agg(
        F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies")
    )


# ----------------------------------------------------- bounded n-gram jaccard
@query(
    "docs_ngram_jaccard",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, source,
               list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS words
        FROM documents
    ), e AS (
        SELECT doc_id, source, len(words) AS nw, unnest(words) AS word FROM d
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           COUNT(*) AS n_common,
           a.nw AS nw_a, b.nw AS nw_b,
           CAST(COUNT(*) AS DOUBLE) / (a.nw + b.nw - COUNT(*)) AS jaccard
    FROM e a JOIN e b
      ON a.word = b.word AND a.source = b.source
     AND a.doc_id < b.doc_id AND b.doc_id <= a.doc_id + 40
    GROUP BY a.doc_id, b.doc_id, a.nw, b.nw
    HAVING CAST(COUNT(*) AS DOUBLE) / (a.nw + b.nw - COUNT(*)) >= 0.2
    """,
)
def docs_ngram_jaccard(spark, sf_dir):
    """Word-set Jaccard similarity over a bounded candidate window (same
    source, id distance <= 40) — the exact-verify kernel that LSH methods
    narrow to. Explode + equi-join + count; int/int jaccard is IEEE-stable."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.array_distinct(F.expr(r"split(trim(lower(text)), '\\s+')")).alias("words"),
    )
    e = d.select("doc_id", "source", F.size("words").alias("nw"), F.explode("words").alias("word"))
    a, b = e.alias("a"), e.alias("b")
    j = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.doc_id") <= F.col("a.doc_id") + 40),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.nw").cast("long").alias("nw_a"),
            F.col("b.nw").cast("long").alias("nw_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (F.col("nw_a") + F.col("nw_b") - F.col("n_common"))
    return j.select("id_a", "id_b", "n_common", "nw_a", "nw_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.2
    )


# ------------------------------------------------------------- MinHash + LSH
def minhash_signature(df: DataFrame, text_col: str = "text", ngram: int = 3) -> DataFrame:
    """Append a MinHash signature column ``sig: array<long>``.

    Shingles are word ``ngram``-grams; each shingle is hashed with
    xxhash64, and each of the NUM_PERM permutations takes
    ``min((a*h + b) mod P)``. All JVM-side (higher-order functions), so it
    scales as a pure map stage."""
    tokens = F.expr(rf"split(trim(lower({text_col})), '\\s+')")
    df = df.withColumn("_tokens", tokens)
    n = F.size("_tokens")
    shingles = F.when(
        n >= ngram,
        F.expr(
            f"transform(sequence(0, size(_tokens) - {ngram}), i -> "
            f"xxhash64(concat_ws(' ', slice(_tokens, i + 1, {ngram}))))"
        ),
    ).otherwise(F.expr("array(xxhash64(concat_ws(' ', _tokens)))"))
    df = df.withColumn("_shingles", shingles)
    sig = F.array(
        *[
            F.array_min(
                F.expr(
                    f"transform(_shingles, h -> pmod({a}L * (h & {_P}L) + {b}L, {_P}L))"
                )
            )
            for a, b in _AB
        ]
    )
    return df.withColumn("sig", sig).drop("_tokens", "_shingles")


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band the signatures (BAND_ROWS rows/band) and emit candidate pairs
    that collide in >=1 band, with their estimated jaccard (fraction of
    equal signature slots). One shuffle on band keys; no quadratic scan."""
    nbands = NUM_PERM // BAND_ROWS
    bands = F.array(
        *[
            F.xxhash64(F.lit(b), *[F.col("sig")[b * BAND_ROWS + r] for r in range(BAND_ROWS)])
            for b in range(nbands)
        ]
    )
    e = sigs.select(F.col(id_col), "sig", F.explode(bands).alias("band_key"))
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))").cast("double")
        / NUM_PERM
    )
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))


@query("docs_minhash_lsh")  # xxhash64-based -> rows-only driver check
def docs_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidates (shingle -> minhash -> band ->
    bucket-join). Deterministic given the fixed permutation constants;
    recall vs exact Jaccard is asserted in tests/test_dedup.py."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = minhash_signature(d)
    return lsh_candidate_pairs(sigs).filter(F.col("est_jaccard") >= 0.5).orderBy("id_a", "id_b")


# ------------------------------------------------------------------- SimHash
SIMHASH_BITS = 16


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append a ``simhash`` int column: sign-aggregated shingle-hash bits.
    JVM-side: one aggregate per bit over the shingle-hash array."""
    df = df.withColumn(
        "_h", F.expr(rf"transform(split(trim(lower({text_col})), '\\s+'), t -> xxhash64(t))")
    )
    bit_sum = [
        F.expr(f"aggregate(_h, 0L, (acc, h) -> acc + 2 * ((h >> {i}) & 1) - 1)") for i in range(SIMHASH_BITS)
    ]
    code = None
    for i, s in enumerate(bit_sum):
        term = F.when(s > 0, F.lit(1 << i)).otherwise(F.lit(0))
        code = term if code is None else code + term
    return df.withColumn("simhash", code.cast("long")).drop("_h")


@query("docs_simhash")  # rows-only (xxhash64-based)
def docs_simhash(spark, sf_dir):
    """SimHash codes + bucket sizes: docs sharing a code are near-dup
    candidates at Hamming distance 0."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    coded = simhash(d)
    sizes = coded.groupBy("simhash").agg(F.count(F.lit(1)).alias("bucket_size"))
    return coded.join(sizes, "simhash").select("doc_id", "simhash", "bucket_size").orderBy("doc_id")
