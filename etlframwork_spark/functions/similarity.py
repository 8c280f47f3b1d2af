"""Similarity search over embedding columns: brute-force cosine top-k
(the correctness baseline) and an LSH-bucketed approximate variant (the
scale path).

Cross-engine determinism trick for the oracle-checked query: embeddings
are quantized to integers (round(x * 1000)) before reduction — integer
dot products are exact and order-independent, and sqrt/division on
identical inputs are IEEE-correctly-rounded, so Spark and DuckDB produce
bit-identical doubles with no float-sum ordering hazard.

Scale posture: the query side is broadcast (top-k against N queries is a
broadcast nested-loop + per-query top-k, no shuffle of the corpus); the
LSH variant buckets by random-hyperplane sign codes so candidate
generation is an equi-join on codes.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..operators.registry import query
from ..sources.io import load_table

_QUANT = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"


def _quantized(df: DataFrame) -> DataFrame:
    q = F.expr(_QUANT)
    norm2 = F.expr("aggregate(q, 0L, (acc, v) -> acc + v * v)")
    return df.withColumn("q", q).withColumn("norm2", norm2)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (brute force).

    ``corpus``/``queries`` need columns (vec_id, q, norm2). Round-7
    shape: the query side is collected to the driver (the SAME
    O(#queries) driver footprint the former ``F.broadcast`` already
    implied) and closure-shipped into a ``mapInArrow`` stage that scores
    each corpus Arrow batch against every query with ONE numpy matmul
    (optimization guide §4.2 — batch-native kernels beat per-pair
    expression evaluation; the former ``aggregate(zip_with(...))``
    per-pair plan is interpreted, not codegen, and measured ~10x slower).

    Bit-exactness argument (the driver hash-compares vs DuckDB): the
    quantized dot product is integer-valued with |dot| << 2^53, so every
    float64 partial sum inside the matmul is exact regardless of
    accumulation order; sqrt and the divide are single IEEE ops applied
    in the same order as the SQL expression — the cosine doubles are
    bit-identical to the former plan.

    Each batch emits only rows that can still reach the global top-k
    (>= the batch's k-th best per query, ties kept; NaN ordered largest
    to match Spark double ordering); the exact (cosine DESC, neighbor
    ASC) rank semantics are applied by the final window over those few
    candidates. Ordering ties break on neighbor id (unique)."""
    import numpy as np

    q_rows = queries.select("vec_id", "q", "norm2").collect()
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = (
        np.array([r["q"] for r in q_rows], dtype=np.float64).reshape(len(q_rows), -1)
        if q_rows
        else np.zeros((0, 1))
    )
    qnorm = np.sqrt(np.array([r["norm2"] for r in q_rows], dtype=np.float64))
    kk = int(k)

    def score_batches(batches):
        import pyarrow as pa

        out_schema = pa.schema(
            [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("cosine", pa.float64())]
        )
        if qids.size == 0:
            return
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            vec_ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            C = (
                b.column("q")
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(n, -1)
            )
            cnorm = np.sqrt(b.column("norm2").to_numpy(zero_copy_only=False).astype(np.float64))
            sims = (C @ Q.T) / (cnorm[:, None] * qnorm[None, :])
            self_mask = vec_ids[:, None] == qids[None, :]
            # candidate superset per query: everything >= the k-th best in
            # this batch (NaN ranked largest, exactly like Spark's double
            # ordering); self-pairs excluded via -inf
            kv = np.where(np.isnan(sims), np.inf, sims)
            kv = np.where(self_mask, -np.inf, kv)
            if n > kk:
                thresh = np.partition(kv, n - kk, axis=0)[n - kk, :]
            else:
                thresh = np.full(qids.size, -np.inf)
            keep = (kv >= thresh[None, :]) & ~self_mask
            rows, cols = np.nonzero(keep)
            if rows.size:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(qids[cols]),
                        pa.array(vec_ids[rows]),
                        pa.array(sims[rows, cols]),
                    ],
                    schema=out_schema,
                )

    cand = corpus.select("vec_id", "q", "norm2").mapInArrow(
        score_batches, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


@query(
    "emb_cosine_topk",
    oracle="""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
        FROM embeddings
    ), n AS (
        SELECT vec_id, q,
               list_sum(list_transform(q, x -> x * x)) AS norm2
        FROM v
    ), pairs AS (
        SELECT qv.vec_id AS query_id, cv.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(list_zip(cv.q, qv.q), p -> p[1] * p[2])) AS DOUBLE)
                   / (sqrt(CAST(cv.norm2 AS DOUBLE)) * sqrt(CAST(qv.norm2 AS DOUBLE))) AS cosine
        FROM n cv, n qv
        WHERE qv.vec_id % 100 = 0 AND cv.vec_id != qv.vec_id
    )
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank,
           cosine
    FROM pairs
    QUALIFY rank <= 5
    """,
)
def emb_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for every 100th vector as query — the ANN
    correctness baseline, integer-quantized for cross-engine exactness.
    spread=True fans the corpus scoring stage over all cores (the few-MB
    parquet otherwise plans 2 scan tasks — guide §2.6/§6)."""
    emb = _quantized(load_table(spark, sf_dir, "embeddings", spread=True))
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    return cosine_topk(emb, qs, k=5)


# ------------------------------------------------------- LSH-bucketed ANN
# Multi-table random-hyperplane LSH: L independent tables of B planes.
# A pair is a candidate if it collides in ANY table. For cosine ~0.95
# (agree prob ~0.9/plane): P(hit) = 1 - (1 - 0.9^B)^L ~ 0.95 with B=6, L=4
# — single-table codes top out near 0.9^12 ~ 0.28 recall.
_PLANES_SEED = 7
_N_TABLES = 4
_BITS_PER_TABLE = 6

# Testdata embedding dimensionality (FIXTURES.md: embeddings.embedding is
# list<float> of 64) — a schema constant, NOT probed via a driver-side
# single-row fetch on the data path.
EMBEDDING_DIM = 64

# Buckets larger than this are dropped from candidate generation: a
# degenerate corpus (all vectors in one orthant) must produce bounded join
# groups, not an all-pairs blowup. At 100 TB this is the knob that keeps
# the band-join worst case linear; recall loss only affects pathological
# buckets that carry no discriminating information anyway.
MAX_CODE_BUCKET = 1000


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(_PLANES_SEED)
    return rng.standard_normal((_N_TABLES, _BITS_PER_TABLE, dim)).round(6)


def hyperplane_codes(df: DataFrame, dim: int) -> DataFrame:
    """Append ``codes: array<long>`` — one sign code per LSH table
    (deterministic seeded planes, JVM-side dot products)."""
    planes = _planes(dim)
    codes = []
    for t in range(_N_TABLES):
        bits = []
        for i in range(_BITS_PER_TABLE):
            arr = "array(" + ", ".join(f"CAST({v} AS DOUBLE)" for v in planes[t, i]) + ")"
            s = F.expr(
                f"aggregate(zip_with(embedding, {arr}, (x, y) -> CAST(x AS DOUBLE) * y), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            bits.append(F.when(s > 0, F.lit(1 << i)).otherwise(F.lit(0)))
        code = bits[0]
        for b in bits[1:]:
            code = code + b
        # disambiguate tables by offsetting the code space
        codes.append((code + F.lit(t << _BITS_PER_TABLE)).cast("long"))
    return df.withColumn("codes", F.array(*codes))


def _grouped_bucket_pairs(e: DataFrame, max_bucket: int, mask_fn) -> DataFrame:
    """All within-bucket pairs (id_a < id_b) with exact quantized cosine,
    evaluated bucket-at-a-time with numpy (round 7, guide §4.2).

    ``e`` needs (vec_id, q, norm2, code). One shuffle groups each code
    bucket into a task; the per-bucket score matrix is ONE numpy matmul
    instead of |bucket|^2/2 interpreted ``aggregate(zip_with(...))``
    evaluations, and only pairs surviving ``mask_fn`` cross back to the
    JVM (the former plan shipped EVERY candidate pair through the
    dedup shuffle before filtering). Exactness: quantized dots are
    integer-valued float64 << 2^53 — matmul accumulation is exact in any
    order; sqrt/divide are the same single IEEE ops as the SQL
    expression, so cosines (and any integer threshold arithmetic in
    ``mask_fn``) are bit-identical to the former per-pair plan.

    The hot-bucket cap is applied in-function (a bucket with more than
    ``max_bucket`` members yields nothing) — identical bucket-granular
    semantics to the former window-count ``drop_hot_buckets`` pass, one
    shuffle cheaper. ``mask_fn(dot_f64, na, nb, cosine) -> bool mask``
    selects the pairs to emit. applyInArrow (not pandas) so the vector
    column converts via one columnar flatten+reshape, never a per-row
    object array."""
    import pyarrow as pa

    schema_pa = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64())]
    )
    empty = pa.Table.from_arrays(
        [
            pa.array([], pa.int64()),
            pa.array([], pa.int64()),
            pa.array([], pa.float64()),
        ],
        schema=schema_pa,
    )

    def bucket_pairs(tbl: "pa.Table") -> "pa.Table":
        n = tbl.num_rows
        if n < 2 or n > max_bucket:
            return empty
        tbl = tbl.combine_chunks()
        ids = tbl.column("vec_id").chunk(0).to_numpy(zero_copy_only=False)
        C = (
            tbl.column("q")
            .chunk(0)
            .flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        n2 = tbl.column("norm2").chunk(0).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, C, n2 = ids[order], C[order], n2[order]
        iu, ju = np.triu_indices(n, 1)
        d = (C @ C.T)[iu, ju]
        na, nb = n2[iu], n2[ju]
        cos = d / (np.sqrt(na.astype(np.float64)) * np.sqrt(nb.astype(np.float64)))
        m = mask_fn(d, na, nb, cos)
        return pa.Table.from_arrays(
            [pa.array(ids[iu][m]), pa.array(ids[ju][m]), pa.array(cos[m])],
            schema=schema_pa,
        )

    return e.groupBy("code").applyInArrow(
        bucket_pairs, schema="id_a long, id_b long, cosine double"
    )


def _coded_exploded(emb: DataFrame, dim: int) -> DataFrame:
    """(vec_id, q, norm2, code) with one exploded row per LSH table —
    the shared input of the bucketed pair generators.

    Round 7: the sign codes are computed in a mapInArrow stage — one
    vectorized numpy pass per batch — instead of 24 interpreted
    ``aggregate(zip_with(...))`` folds per row (hyperplane_codes, kept as
    the reference implementation). Bit-exact by construction: products
    ``CAST(x AS DOUBLE) * plane`` are the same IEEE multiplies, and
    ``cumsum`` accumulates strictly sequentially — the identical order
    the SQL fold uses — so every sign (and thus every code) matches the
    reference (pinned by test_numpy_codes_match_reference)."""
    planes = _planes(dim)

    def add_codes(batches):
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            X = (
                b.column("embedding")
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(n, -1)
            )
            codes = np.zeros((n, _N_TABLES), dtype=np.int64)
            for t in range(_N_TABLES):
                code = np.zeros(n, dtype=np.int64)
                for i in range(_BITS_PER_TABLE):
                    s = (X * planes[t, i][None, :]).cumsum(axis=1)[:, -1]
                    code += np.where(s > 0, np.int64(1 << i), np.int64(0))
                codes[:, t] = code + np.int64(t << _BITS_PER_TABLE)
            offsets = pa.array(np.arange(0, _N_TABLES * (n + 1), _N_TABLES, dtype=np.int32))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("vec_id"),
                    b.column("q"),
                    b.column("norm2"),
                    pa.ListArray.from_arrays(offsets, pa.array(codes.ravel())),
                ],
                names=["vec_id", "q", "norm2", "codes"],
            )

    coded = _quantized(emb).select("vec_id", "embedding", "q", "norm2").mapInArrow(
        add_codes, schema="vec_id long, q array<long>, norm2 long, codes array<long>"
    )
    return coded.select("vec_id", "q", "norm2", F.explode("codes").alias("code"))


def ann_candidate_pairs(
    emb: DataFrame,
    dim: int = EMBEDDING_DIM,
    max_bucket: int = MAX_CODE_BUCKET,
    min_cosine: float | None = None,
) -> DataFrame:
    """LSH candidate pairs with exact quantized cosine attached.

    Candidate generation groups exploded sign codes (one shuffle, never
    all-pairs); buckets above ``max_bucket`` members are excluded so a
    degenerate corpus cannot create a quadratic join group. Scoring is
    the grouped numpy matmul (see _grouped_bucket_pairs). ``min_cosine``
    (optional) drops below-threshold pairs before they cross back to the
    JVM — pure pushdown of the caller's own filter, identical result."""
    e = _coded_exploded(emb, dim)
    if min_cosine is None:
        mask = lambda d, na, nb, cos: np.ones(len(d), dtype=bool)  # noqa: E731
    else:
        # NaN parity with the former JVM filter: Spark orders NaN above
        # every double, so `cosine >= t` KEEPS a NaN cosine (zero-norm
        # vector); numpy comparisons drop NaN — keep them explicitly
        mask = lambda d, na, nb, cos: (cos >= min_cosine) | np.isnan(cos)  # noqa: E731
    return _grouped_bucket_pairs(e, max_bucket, mask).dropDuplicates(["id_a", "id_b"])


# ----------------------------------------------------------------- IVF (flat)
# Coarse-quantizer ANN: assign every vector to its nearest of K centroid
# cells (Voronoi), search only the query's nprobe nearest cells, exact
# re-rank inside. Centroids are an INPUT (at deployment they come from an
# offline k-means); the driver query uses seeded deterministic centroids
# so the result is reproducible without a training step.
IVF_CELLS = 8
IVF_SEED = 11


def _ivf_centroids(dim: int, k: int = IVF_CELLS) -> np.ndarray:
    rng = np.random.default_rng(IVF_SEED)
    c = rng.standard_normal((k, dim))
    return (c / np.linalg.norm(c, axis=1, keepdims=True)).round(6)


# Cluster-structure gate for the trained centroids: if the training
# sample's mean max-cosine to the fitted centroids is below this, the
# corpus is near-isotropic — the fit is chasing noise and the trained
# centroids generalize WORSE off-sample than the seeded planes (measured
# round 3 on the driver embeddings: trained 0.32 vs seeded 0.48 top-5
# recall). Isotropic expectation for the max of k=8 unit directions in
# d=64 is ~0.26; genuinely clustered corpora sit >0.9 — 0.6 separates
# them with wide margin on both sides.
CLUSTER_GATE_MIN_COS = 0.6


def train_ivf_centroids(
    df: DataFrame,
    k: int = IVF_CELLS,
    sample_mod: int = 4,
    iters: int = 8,
    seed: int = IVF_SEED,
    dim: int = EMBEDDING_DIM,
) -> np.ndarray:
    """LEARNED IVF centroids: spherical k-means on a deterministic sample
    (round-2 'What's missing' #4 — seeded random centroids waste recall
    because real corpora are clustered, not isotropic).

    Scale shape: the sample filter (``xxhash64(vec_id) % sample_mod ==
    0``) is a pure map over the corpus; the fit runs as ONE applyInPandas
    task over the sampled rows — the standard sampled-k-means trade
    (size ``sample_mod`` so corpus/sample_mod vectors fit one task; at
    10^10 vectors that is sample_mod ~ 10^4). Only the K centroid rows
    ever reach the driver — a metadata-scale collect, same class as
    merge_batch's bucket stats.

    Deterministic end-to-end: hash-based sampling, rows sorted by vec_id
    inside the fit (float summation order fixed), seeded init, fixed
    iteration count bound; centroids rounded to 6 decimals like the
    seeded ones.

    Measured (round 3): on clustered vectors trained centroids reach
    0.996 top-5 recall at nprobe=2/8 vs 0.973 seeded
    (tests/test_similarity.py). On the driver's near-ISOTROPIC testdata
    embeddings (max pairwise cosine ~0.51) both sit near the 2/8-cell
    chance floor and the fit chases noise (trained 0.32, seeded 0.48 over
    5 queries) — so the fit is GATED (round 4): a sample whose mean
    max-cosine to the fitted centroids is below CLUSTER_GATE_MIN_COS
    falls back to the seeded planes, making trained-or-fallback >= seeded
    on every corpus (pinned both ways in tests/test_similarity.py)."""
    import pandas as pd

    s = df.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(sample_mod)) == 0).select(
        "vec_id", "embedding"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
        rng = np.random.default_rng(seed)
        n = len(X)
        idx = rng.choice(n, size=min(k, n), replace=False)
        C = X[idx].copy()
        if len(C) < k:  # degenerate tiny sample: pad with seeded planes
            C = np.vstack([C, _ivf_centroids(X.shape[1], k - len(C))])
        for _ in range(iters):
            assign = (X @ C.T).argmax(axis=1)
            for j in range(k):
                members = X[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
            C = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)
        # cluster-structure gate (round-3 verdict): on a near-isotropic
        # sample the fit has no structure to find and the trained
        # centroids measure WORSE than seeded off-sample — fall back
        if float((X @ C.T).max(axis=1).mean()) < CLUSTER_GATE_MIN_COS:
            C = _ivf_centroids(X.shape[1], k)
        return pd.DataFrame({"cell": list(range(k)), "centroid": [c.round(6).tolist() for c in C]})

    out = (
        s.groupBy(F.lit(0).alias("_g"))
        .applyInPandas(lambda pdf: fit(pdf), schema="cell int, centroid array<double>")
        .collect()  # K rows of metadata (the trained model), never data
    )
    if not out:
        # empty hash sample (tiny corpus, nothing hashed to 0): the seeded
        # planes are the only defined model — crashing here was round-3
        # ADVICE; dim comes from the caller (schema constant), not a probe
        return _ivf_centroids(dim, k)
    cents = np.zeros((k, len(out[0]["centroid"])))
    for r in out:
        cents[r["cell"]] = r["centroid"]
    return cents


def ivf_assign(df: DataFrame, centroids: np.ndarray, nprobe: int = 1) -> DataFrame:
    """Append ``cells: array<int>`` — the ``nprobe`` nearest centroid ids
    by dot product with the (unit-norm) centroids. All JVM expressions:
    per row this is K dot products + a K-element sort, no Python, no
    shuffle — a pure map stage at any scale."""
    k = len(centroids)
    dots = []
    for i, c in enumerate(centroids):
        arr = "array(" + ", ".join(f"CAST({v} AS DOUBLE)" for v in c) + ")"
        dots.append(
            f"named_struct('s', -aggregate(zip_with(embedding, {arr}, "
            f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (a, v) -> a + v), 'i', {i})"
        )
    expr = (
        f"transform(slice(array_sort(array({', '.join(dots)})), 1, {nprobe}), x -> x.i)"
    )
    return df.withColumn("cells", F.expr(expr))


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: np.ndarray, k: int, nprobe: int = 2) -> DataFrame:
    """IVF-flat top-k: corpus vectors live in their single nearest cell;
    each query probes its ``nprobe`` nearest cells; exact quantized cosine
    re-ranks within the probed cells. One equi-join shuffle on cell id —
    never an all-pairs scan; cells bound the work like LSH buckets do."""
    cps = ivf_assign(_quantized(corpus), centroids, nprobe=1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("cq"),
        F.col("norm2").alias("cnorm2"),
        F.element_at("cells", 1).alias("cell"),
    )
    qs = ivf_assign(_quantized(queries), centroids, nprobe=nprobe).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("norm2").alias("qnorm2"),
        F.explode("cells").alias("cell"),
    )
    dot = F.expr("aggregate(zip_with(cq, qq, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
    sim = dot.cast("double") / (
        F.sqrt(F.col("cnorm2").cast("double")) * F.sqrt(F.col("qnorm2").cast("double"))
    )
    pairs = (
        cps.join(qs, ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])  # nprobe cells may repeat a pair
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


@query("emb_ivf_topk")  # rows-only: trained centroids, float dot inside assign
def emb_ivf_topk(spark, sf_dir):
    """IVF-flat ANN over the embeddings table with LEARNED centroids
    (sampled spherical k-means — deterministic, see train_ivf_centroids):
    every 100th vector queries its 2 nearest of 8 cells, exact re-rank to
    top-5. Recall vs brute force asserted in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb)
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(emb, qs, cents, k=5, nprobe=2).orderBy("query_id", "rank")


def emb_ann_lsh(spark, sf_dir):
    """Approximate NN via multi-table hyperplane LSH: candidates collide in
    >=1 table's sign code; exact quantized cosine re-ranks within buckets.
    Cutoff 0.4 is calibrated to the driver corpus (max pairwise cosine in
    the sf0.01 embeddings is ~0.51, so a 0.8 cutoff would be vacuously
    empty). Recall asserted in tests/test_similarity.py.

    NOT driver-registered since round 6 (was rows-only): its slot in the
    driver's 50-query window went to the oracle-paired
    cdc_sync_incremental_state; correctness stays pinned by
    test_hyperplane_lsh_recall_on_clusters."""
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    return (
        ann_candidate_pairs(emb, min_cosine=0.4)
        .filter(F.col("cosine") >= 0.4)
        .orderBy("id_a", "id_b")
    )


# ------------------------------------------------- embedding-cosine near-dup
# Dedup by embedding similarity: pairs with cos(a, b) >= tau are duplicate
# candidates. The threshold is evaluated in EXACT int64 arithmetic on the
# quantized vectors — cos >= num/den  <=>  dot > 0 AND den^2*dot^2 >=
# num^2*norm2_a*norm2_b — so Spark and a SQL oracle agree bit-for-bit with
# no float-comparison boundary hazard (a pair exactly AT the threshold is
# included by both engines or neither). Domain: safe in int64 for
# |component| <= ~2.1 at dim 64 with the 1e3 quantizer (unit-norm-ish
# embeddings are far inside; the driver corpus max |q| is ~350).
#
# Scale split, same shape as topk-vs-ANN: `neardup_exact_pairs` is the
# brute-force correctness baseline (and the oracle-paired driver query);
# `neardup_lsh_pairs` is the 100-TB path — candidates from the multi-table
# hyperplane codes (equi-join on exploded sign codes, hot buckets capped),
# then the SAME exact integer verify, so precision is 1.0 by construction
# and only recall is approximate (pinned in tests/test_similarity.py on a
# planted-duplicate corpus).


def _neardup_cond(num: int, den: int):
    """cos >= num/den as an exact int64 predicate over (dot, na, nb)."""
    if not (0 < num <= den):
        raise ValueError(f"threshold num/den must be in (0, 1]: {num}/{den}")
    return (F.col("dot") > 0) & (
        F.lit(den * den) * F.col("dot") * F.col("dot")
        >= F.lit(num * num) * F.col("na") * F.col("nb")
    )


def _cosine_col():
    return (
        F.col("dot").cast("double")
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
    ).alias("cosine")


def _pair_dot():
    return F.expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")


def neardup_exact_pairs(emb: DataFrame, num: int, den: int) -> DataFrame:
    """ALL pairs with quantized cosine >= num/den — brute force (O(n^2)
    pair evaluations, JVM codegen). The correctness baseline the LSH
    variant's recall is measured against; usable directly up to ~10^5
    vectors per group, not the 100-TB path."""
    q = emb if "q" in emb.columns else _quantized(emb)
    a = q.select(F.col("vec_id").alias("id_a"), F.col("q").alias("qa"), F.col("norm2").alias("na"))
    b = q.select(F.col("vec_id").alias("id_b"), F.col("q").alias("qb"), F.col("norm2").alias("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dot", _pair_dot())
        .filter(_neardup_cond(num, den))
        .select("id_a", "id_b", _cosine_col())
    )


def neardup_lsh_pairs(
    emb: DataFrame,
    num: int,
    den: int,
    dim: int = EMBEDDING_DIM,
    max_bucket: int = MAX_CODE_BUCKET,
) -> DataFrame:
    """Near-dup pairs at scale: multi-table hyperplane LSH candidates
    (one shuffle on sign codes, hot buckets capped — never all-pairs) ->
    exact integer threshold verify INSIDE the bucket kernel (round 7:
    grouped numpy matmul, see _grouped_bucket_pairs — the threshold
    arithmetic runs in int64 exactly like the former _neardup_cond SQL,
    so the pair set is bit-identical). Output is a SUBSET of
    neardup_exact_pairs (precision 1.0); recall is the multi-table hit
    probability (high for true near-dups, cos >= ~0.9)."""
    if not (0 < num <= den):
        raise ValueError(f"threshold num/den must be in (0, 1]: {num}/{den}")
    e = _coded_exploded(emb, dim)
    den2, num2 = den * den, num * num

    def mask(d, na, nb, cos):
        # exact int64 arithmetic — same domain bound as _neardup_cond
        # (|component| <= ~2.1 at dim 64 with the 1e3 quantizer). The
        # former JVM expression ran under ANSI mode and THREW on int64
        # overflow; numpy wraps silently, so guard the bound loudly
        # (Python ints are arbitrary-precision, so the check is exact)
        di = d.astype(np.int64)
        if len(di):
            hi = max(den2 * int(abs(di).max()) ** 2, num2 * int(na.max()) * int(nb.max()))
            if hi > (1 << 63) - 1:
                raise ArithmeticError(
                    "neardup threshold arithmetic would overflow int64 — "
                    "embedding components exceed the documented quantizer domain"
                )
        return (di > 0) & (den2 * di * di >= num2 * na.astype(np.int64) * nb.astype(np.int64))

    return _grouped_bucket_pairs(e, max_bucket, mask).dropDuplicates(["id_a", "id_b"])


def neardup_keepers(emb: DataFrame, pairs: DataFrame) -> DataFrame:
    """Dedup decision over an embedding near-dup pair graph: connected
    components (shared engine: functions.dedup.connected_min_labels —
    count-gated union-find fast path / pointer-jumping at scale), keeper =
    min vec_id per component; singletons keep themselves."""
    from .dedup import connected_min_labels

    labels = connected_min_labels(pairs)
    return (
        emb.select("vec_id")
        .join(labels, emb["vec_id"] == labels["node"], "left")
        .select(
            "vec_id",
            F.coalesce(F.col("label"), F.col("vec_id")).alias("keeper_id"),
        )
    )


@query(
    "emb_neardup_pairs",
    oracle="""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
        FROM embeddings
    ), n AS (
        SELECT vec_id, q,
               list_sum(list_transform(q, x -> x * x)) AS norm2
        FROM v
    ), p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(list_sum(list_transform(list_zip(a.q, b.q), pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
               a.norm2 AS na, b.norm2 AS nb
        FROM n a JOIN n b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
    FROM p
    WHERE dot > 0 AND 25 * dot * dot >= 4 * na * nb
    """,
)
def emb_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs, ORACLE-PAIRED (round 5): every
    pair with quantized cosine >= 2/5, threshold evaluated in exact int64
    so the hash matches DuckDB bit-for-bit (including pairs exactly AT
    the boundary). tau=0.4 is calibrated to the driver corpus like
    emb_ann_lsh (max pairwise cosine ~0.55 — a real near-dup tau of 0.9
    would be vacuously empty here); the operator itself is
    threshold-parametric and the LSH scale path is recall-pinned at
    tau=0.9 on a planted-duplicate corpus in tests/test_similarity.py."""
    emb = _quantized(load_table(spark, sf_dir, "embeddings"))
    return neardup_exact_pairs(emb, num=2, den=5)
