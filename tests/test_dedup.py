"""Quality oracles for the non-SQL dedup operators (MinHash+LSH, SimHash):
verified against exact shingle-set Jaccard computed in plain Python on a
constructed corpus with known near-duplicates."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etlframwork_spark.functions.dedup import (
    NUM_PERM,
    lsh_candidate_pairs,
    minhash_signature,
    shingle_sets,
    simhash,
    simhash_pairs,
    verify_pairs_exact,
)

WORDS = [f"w{i}" for i in range(200)]


def _corpus():
    """30 base docs + a ~90%-overlap mutation of each + 20 unrelated docs."""
    rng = random.Random(42)
    docs = []
    for i in range(30):
        base = [rng.choice(WORDS) for _ in range(60)]
        docs.append((i, " ".join(base)))
        mut = list(base)
        for _ in range(2):  # mutate ~3% of tokens (each kills <=3 shingles/side)
            mut[rng.randrange(len(mut))] = rng.choice(WORDS)
        docs.append((1000 + i, " ".join(mut)))
    for i in range(20):
        docs.append((2000 + i, " ".join(rng.choice(WORDS) for _ in range(60))))
    return docs


def _shingles(text: str, n=3):
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _true_jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def test_minhash_lsh_recall_and_precision(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sigs = minhash_signature(df)
    cands = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in lsh_candidate_pairs(sigs).collect()
    }
    by_id = dict(docs)
    # ground truth: all pairs with true jaccard >= 0.7 (the planted mutations)
    ids = sorted(by_id)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _true_jaccard(by_id[a], by_id[b]) >= 0.7
    }
    assert len(truth) >= 25  # the planted pairs exist
    found = truth & set(cands)
    recall = len(found) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.2f} too low"
    # estimates should track the true jaccard within MinHash error bounds
    for (a, b) in found:
        tj = _true_jaccard(by_id[a], by_id[b])
        assert abs(cands[(a, b)] - tj) <= 2.5 / (NUM_PERM**0.5), (a, b, tj, cands[(a, b)])


def test_minhash_identical_docs_full_signature_match(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon zeta")],
        ["doc_id", "text"],
    )
    pairs = lsh_candidate_pairs(minhash_signature(df)).collect()
    assert len(pairs) == 1
    assert pairs[0]["est_jaccard"] == 1.0


def test_simhash_pairs_hamming_banding_recall(spark):
    """Segment banding must find EVERY pair within Hamming <= 3 (pigeonhole
    guarantee), and most planted near-dup text pairs should be within it."""
    docs = _corpus()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    coded = simhash(df)
    codes = {r["doc_id"]: r["simhash"] for r in coded.collect()}
    ids = sorted(codes)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(codes[a] ^ codes[b]).count("1") <= 3
    }
    got = {(r["id_a"], r["id_b"]) for r in simhash_pairs(coded).collect()}
    assert got == truth, f"banding missed {len(truth - got)} / extra {len(got - truth)}"
    # the planted mutations should mostly land within hamming 3 (recall as a
    # near-dup TOOL, mirroring the MinHash recall test)
    planted = {(i, 1000 + i) for i in range(30)}
    recall = len(planted & got) / len(planted)
    assert recall >= 0.6, f"simhash near-dup recall {recall:.2f}"


def test_simhash_shingle_variant_trades_recall_for_precision(spark):
    """Pin the measured reason simhash defaults to UNIGRAM features: with
    3-gram shingles a single token edit perturbs 3 features, so planted
    near-dup recall at Hamming<=3 drops well below the unigram default
    (0.27 vs >=0.6 when measured in round 3)."""
    docs = _corpus()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    planted = {(i, 1000 + i) for i in range(30)}

    def recall(ngram):
        coded = simhash(df, ngram=ngram)
        got = {(r["id_a"], r["id_b"]) for r in simhash_pairs(coded).collect()}
        return len(planted & got) / len(planted)

    r_uni, r_shingle = recall(1), recall(3)
    assert r_uni >= 0.6
    assert r_shingle < r_uni, f"shingle recall {r_shingle} vs unigram {r_uni}"


def test_ngram_jaccard_df_cap_bounds_stopword_groups(spark):
    """A stopword-heavy degenerate corpus must NOT enumerate a quadratic
    join group: words over the per-source document-frequency cap are
    dropped from index AND vocabulary before pairing (round-2 verdict:
    the raw-word join group for 'the' was the scale killer)."""
    from etlframwork_spark.functions.dedup import drop_hot_buckets

    # 200 docs, every one contains 'the the the'; unique tail words
    docs = [(i, "s0", f"the the the unique{i} tail{i}") for i in range(200)]
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    e = df.select(
        "doc_id", "source",
        F.explode(F.array_distinct(F.expr(r"split(trim(lower(text)), '\\s+')"))).alias("word"),
    )
    capped = drop_hot_buckets(e, ["source", "word"], 20)
    # 'the' (df=200 > 20) is gone; unique words (df=1) survive
    assert capped.filter(F.col("word") == "the").count() == 0
    assert capped.count() == 400  # 2 unique words per doc
    # and no surviving (source, word) group exceeds the cap
    mx = capped.groupBy("source", "word").count().agg(F.max("count")).collect()[0][0]
    assert mx <= 20


def test_lsh_hot_bucket_cap_bounds_join_groups(spark):
    """A degenerate corpus (hundreds of identical docs) must NOT produce a
    quadratic join group: over-cap band buckets are dropped entirely."""
    docs = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(300)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sigs = minhash_signature(df)
    pairs = lsh_candidate_pairs(sigs, max_bucket=50)
    assert pairs.count() == 0  # every bucket holds all 300 docs -> all dropped
    # and with the cap above the corpus size the pairs come back
    assert lsh_candidate_pairs(sigs, max_bucket=500).count() == 300 * 299 // 2


def test_verify_pairs_exact_matches_python_oracle(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    shingled = shingle_sets(df)
    cands = spark.createDataFrame(
        [(docs[0][0], 1000 + docs[0][0]), (docs[0][0], 2000)], ["id_a", "id_b"]
    )
    by_id = dict(docs)
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verify_pairs_exact(cands, shingled).collect()}
    for (a, b), got in out.items():
        assert abs(got - _true_jaccard(by_id[a], by_id[b])) < 1e-12


def test_simhash_exact_and_near(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs + [(9999, docs[0][1])], ["doc_id", "text"])
    codes = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    # identical text -> identical code
    assert codes[9999] == codes[docs[0][0]]
    # planted near-dups -> small hamming distance on average
    dists = [bin(codes[i] ^ codes[1000 + i]).count("1") for i in range(30)]
    from etlframwork_spark.functions.dedup import SIMHASH_BITS

    assert sum(dists) / len(dists) <= SIMHASH_BITS / 4, f"mean hamming {sum(dists)/len(dists)}"


def test_connected_min_labels_chain_and_clusters(spark):
    """Label propagation must reach the min id across a CHAIN (worst-case
    diameter), not just direct pairs."""
    from etlframwork_spark.functions.dedup import connected_min_labels

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (11, 12)],
        ["id_a", "id_b"],
    )
    got = {r["node"]: r["label"] for r in connected_min_labels(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_min_labels_long_chain_converges_log_rounds(spark):
    """Pointer jumping makes convergence O(log diameter): a 40-node chain
    (diameter 39) must converge well inside the default 20 rounds —
    round-2 advice flagged that plain propagation silently mislabels any
    component with diameter > max_iters."""
    from etlframwork_spark.functions.dedup import connected_min_labels

    chain = spark.createDataFrame([(i, i + 1) for i in range(40)], ["id_a", "id_b"])
    got = {r["node"]: r["label"] for r in connected_min_labels(chain, max_iters=9, small_graph_max_edges=0).collect()}
    assert set(got.values()) == {0} and len(got) == 41


def test_connected_min_labels_strategies_agree(spark):
    """The driver union-find fast path and the distributed
    propagation+pointer-jumping loop must produce IDENTICAL labels —
    same min-id representative per component — on a graph mixing a long
    chain, a clique, singleton pairs, and out-of-order edges."""
    from etlframwork_spark.functions.dedup import connected_min_labels

    edges = (
        [(i, i + 1) for i in range(30)]             # chain, diameter 30
        + [(100, 101), (101, 102), (100, 102)]      # triangle
        + [(200, 201)]                              # pair
        + [(77, 5), (60, 40)]                       # cross/out-of-order links
    )
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = {r["node"]: r["label"] for r in connected_min_labels(pairs).collect()}
    loop = {
        r["node"]: r["label"]
        for r in connected_min_labels(pairs, small_graph_max_edges=0).collect()
    }
    assert fast == loop and fast[77] == 0 and fast[102] == 100


def test_connected_min_labels_raises_on_non_convergence(spark):
    """Exhausting max_iters with labels still moving must RAISE, never
    return silently-wrong cluster representatives."""
    import pytest

    from etlframwork_spark.functions.dedup import connected_min_labels

    chain = spark.createDataFrame([(i, i + 1) for i in range(40)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_min_labels(chain, max_iters=2, small_graph_max_edges=0)


def test_source_df_caps_derivation(spark):
    """Round-3 verdict #3: the df cap is derived per source —
    greatest(20, ceil(sqrt(n_docs))) — so the driver corpus (25-doc
    sources) keeps the former constant while a large source's cap grows
    with sqrt(size) instead of dropping its whole vocabulary."""
    from etlframwork_spark.functions.dedup import source_df_caps

    d = spark.createDataFrame(
        [(i, "small") for i in range(25)] + [(i, "big") for i in range(10_000)],
        ["doc_id", "source"],
    )
    caps = {r["source"]: r["df_cap"] for r in source_df_caps(d).collect()}
    assert caps == {"small": 20, "big": 100}  # ceil(sqrt(25))=5 -> floor 20; sqrt(1e4)=100


def test_derived_cap_still_bounds_stopword_corpus(spark):
    """The degenerate stopword corpus stays bounded under the DERIVED cap:
    every word of a 60-doc single-source corpus is universal (df=60 >
    cap=20), so the capped index drops them all and the join enumerates
    zero pairs."""
    from etlframwork_spark.functions.dedup import drop_hot_buckets, source_df_caps
    from pyspark.sql import functions as F

    docs = [(i, "s", "the and of to a in") for i in range(60)]
    d = spark.createDataFrame(docs, ["doc_id", "source", "text"]).select(
        "doc_id", "source",
        F.array_distinct(F.expr(r"split(trim(lower(text)), '\\s+')")).alias("words"),
    )
    caps = source_df_caps(d)
    e = d.select("doc_id", "source", F.explode("words").alias("word"))
    e2 = drop_hot_buckets(e.join(F.broadcast(caps), "source"), ["source", "word"], F.col("df_cap"))
    assert e2.count() == 0


def test_numpy_minhash_matches_reference(spark, sf_dir):
    """Round 7: minhash_signature computes shingle hashes + permutation
    minima in a vectorized numpy mapInArrow kernel; the interpreted HOF
    plan stays as the reference (_minhash_signature_hof). The kernel
    hashes exactly the UTF-8 bytes the JVM concat_ws would produce with
    the S20-pinned XXH64, so every signature must match bit-for-bit —
    on the real fixture corpus AND on whitespace/unicode/null/long-word
    edge cases (including shingles past the 32-byte XXH64 stripe)."""
    from etlframwork_spark.functions.dedup import _minhash_signature_hof
    from etlframwork_spark.sources.io import load_table

    def sigs_of(df):
        ref = {
            r["doc_id"]: r["sig"]
            for r in _minhash_signature_hof(df).select("doc_id", "sig").collect()
        }
        got = {
            r["doc_id"]: r["sig"]
            for r in minhash_signature(df).select("doc_id", "sig").collect()
        }
        return ref, got

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ref, got = sigs_of(d)
    assert ref == got

    rows = [
        (0, "batch part spark line column order small sort"),
        (1, "one two"),
        (2, "single"),
        (3, ""),
        (4, "   "),
        (5, None),
        (6, "a  b   c d e"),
        (7, "Tab\tseparated words here"),
        (8, "Ünïcödé wörds ünïcödé wörds mixed ascii"),
        (9, "x" * 40 + " " + "y" * 40 + " " + "z" * 40 + " tail words here"),
        (10, "MiXeD CaSe WoRdS lower test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref, got = sigs_of(df)
    assert ref == got


def test_numpy_shingles_match_reference(spark, sf_dir):
    """Round 7: shingle_sets assembles distinct shingle strings in the
    vectorized mapInArrow kernel; the interpreted HOF plan stays as the
    reference (_shingle_sets_hof). Byte-for-byte equality including
    array_distinct's first-occurrence ORDER — on the fixture corpus and
    whitespace/unicode/null/repeat edge cases."""
    from etlframwork_spark.functions.dedup import _shingle_sets_hof, shingle_sets
    from etlframwork_spark.sources.io import load_table

    def sets_of(df):
        ref = {
            r["doc_id"]: r["shingles"]
            for r in _shingle_sets_hof(df).select("doc_id", "shingles").collect()
        }
        got = {
            r["doc_id"]: r["shingles"]
            for r in shingle_sets(df).select("doc_id", "shingles").collect()
        }
        return ref, got

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ref, got = sets_of(d)
    assert ref == got

    rows = [
        (0, "batch part spark line column order small sort batch part spark"),
        (1, "one two"),
        (2, "single"),
        (3, ""),
        (4, "   "),
        (5, None),
        (6, "a  b   c d e a b c"),
        (7, "Tab\tseparated words here"),
        (8, "Ünïcödé wörds ünïcödé wörds mixed ascii"),
        (9, "MiXeD CaSe WoRdS lower test repeat repeat repeat repeat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref, got = sets_of(df)
    assert ref == got
