"""Dedup operator tests: hand-built near-dup fixtures + invariants."""

from pyspark.sql import functions as F

from educational_vector_database_spark.operators import dedup as D

DOC_A = "the quick brown fox jumps over the lazy dog near the river bank today"
DOC_A2 = DOC_A + " now"  # near-duplicate of DOC_A
DOC_B = "completely different content about spark query engines and shuffles here"


def _docs(spark):
    return spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A2), (3, DOC_B), (4, DOC_B)],
        "doc_id: long, text: string",
    )


def test_exact_dedup_stats_and_keep_first(spark):
    stats = D.exact_dedup_stats(_docs(spark)).head()
    assert (stats.n_rows, stats.n_distinct, stats.n_duplicates) == (4, 3, 1)
    survivors = D.dedup_exact(_docs(spark))
    rows = {r.doc_id: r.n_copies for r in survivors.collect()}
    assert rows == {1: 1, 2: 1, 3: 2}  # doc 4 deduped into 3 (keep lowest id)


def test_minhash_finds_planted_near_dup(spark):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             D.minhash_near_dup(_docs(spark), threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.8
    assert pairs[(3, 4)] == 1.0  # exact dup is also a near dup
    assert (1, 3) not in pairs


def test_ngram_jaccard_exact_values(spark):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             D.ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.1).collect()}
    assert pairs[(3, 4)] == 1.0
    # DOC_A has 12 trigrams, DOC_A2 has 13, sharing 12 -> 12/13
    assert abs(pairs[(1, 2)] - 12 / 13) < 1e-12
    assert (1, 3) not in pairs


def test_simhash_near_dup_and_hamming_zero_for_equal(spark):
    # identical text -> hamming 0; the near-dup pair must be closer than the
    # unrelated pair (small token sets swing many bits, so a fixed small
    # radius is not a fair assertion here — compute brute-force distances)
    sh = _docs(spark).select("doc_id", D.simhash_hex("text").alias("sh"))
    brute = (
        sh.alias("a").join(sh.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
                sum(F.bit_count(
                    D._nibble_value(F.substring("a.sh", p + 1, 1)).bitwiseXOR(
                        D._nibble_value(F.substring("b.sh", p + 1, 1)))
                ) for p in range(16)).alias("h"))
    )
    out = {(r.id_a, r.id_b): r.h for r in brute.collect()}
    assert out[(3, 4)] == 0  # identical text -> identical simhash
    assert out[(1, 2)] < out[(1, 3)]


def test_simhash_banding_recall_matches_bruteforce(spark):
    # pigeonhole blocking must equal a brute-force hamming filter
    df = _docs(spark)
    blocked = {(r.id_a, r.id_b) for r in D.simhash_near_dup(df, max_hamming=3).collect()}
    sh = df.select("doc_id", D.simhash_hex("text").alias("sh"))
    brute = (
        sh.alias("a").join(sh.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
                sum(F.bit_count(
                    D._nibble_value(F.substring("a.sh", p + 1, 1)).bitwiseXOR(
                        D._nibble_value(F.substring("b.sh", p + 1, 1)))
                ) for p in range(16)).alias("h"))
        .filter("h <= 3")
    )
    assert blocked == {(r.id_a, r.id_b) for r in brute.collect()}


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3 (diameter forces >1 round), pair 7-9, isolated 5 absent
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (7, 9)], "id_a: long, id_b: long"
    )
    comp = {r.id: r.cluster_id for r in D.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_dedup_clusters_end_to_end(spark):
    docs = _docs(spark)  # 1~2 near-dup, 3==4 exact dup
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    out = {r.id: (r.cluster_id, r.is_survivor)
           for r in D.dedup_clusters(docs, pairs).collect()}
    assert out == {
        1: (1, True), 2: (1, False), 3: (3, True), 4: (3, False),
    }


def test_simhash_signatures_bit_identical_to_expression(spark, sf_dir):
    """The vectorized mapInPandas simhash must equal the Column-expression
    simhash_hex bit-for-bit on real corpus text."""
    from educational_vector_database_spark.functions import text as T
    from educational_vector_database_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    expr = {r.doc_id: r.sh for r in
            docs.select("doc_id", D.simhash_hex("text").alias("sh")).collect()}
    fast = {r.id: r.sh for r in D.simhash_signatures(
        docs.select(
            F.col("doc_id").alias("id"),
            F.array_distinct(F.split(T.normalized_text("text"), " ")).alias("toks"),
        )
    ).collect()}
    assert expr == fast


def test_embedding_near_dup_threshold(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0])],
        "vec_id: long, embedding: array<double>",
    )
    pairs = {(r.id_a, r.id_b): r.score for r in
             D.embedding_near_dup(df, threshold=0.9).collect()}
    assert set(pairs) == {(1, 2)} and pairs[(1, 2)] > 0.99


def test_embedding_near_dup_blocked_bit_identical(spark, sf_dir):
    """Block-GEMM path must equal the expression path bit-for-bit (same IEEE
    fold order), for every metric, including tiny block sizes that force many
    cross-block pairs."""
    from educational_vector_database_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    for metric, thr in (("cosine", 0.45), ("dot", 2.0), ("euclidean", 0.35)):
        expr = {(r.id_a, r.id_b): r.score for r in
                D.embedding_near_dup(emb, threshold=thr, metric=metric).collect()}
        blk = {(r.id_a, r.id_b): r.score for r in
               D.embedding_near_dup_blocked(
                   emb, threshold=thr, metric=metric, block_size=64).collect()}
        assert set(expr) == set(blk), metric
        assert all(expr[k] == blk[k] for k in expr), metric


def test_embedding_near_dup_blocked_unknown_metric(spark):
    import pytest

    df = spark.createDataFrame([(1, [1.0])], "vec_id: long, embedding: array<double>")
    with pytest.raises(ValueError):
        D.embedding_near_dup_blocked(df, metric="manhattan")


def test_simhash_degenerate_bucket_capped(spark):
    """An all-empty-docs corpus shares one simhash (0...0): every band bucket
    is degenerate. The max_posting cap must drop those buckets (linear cost,
    zero pairs) instead of generating O(n^2) candidates."""
    docs = spark.createDataFrame(
        [(i, "") for i in range(200)], "doc_id: long, text: string"
    )
    assert D.simhash_near_dup(docs, max_posting=50).count() == 0
    # under the cap the pairs DO come back (documented recall tradeoff)
    small = spark.createDataFrame(
        [(i, "") for i in range(4)], "doc_id: long, text: string"
    )
    assert D.simhash_near_dup(small, max_posting=1000).count() == 6


def test_minhash_null_and_empty_docs_no_crash(spark):
    """NULL texts shingle to [] and share the sentinel signature -> they
    become candidates; the Jaccard verify must skip those zero-union pairs,
    not divide by zero. Empty-STRING docs shingle to {''} and legitimately
    pair with jaccard 1.0 (identical content)."""
    docs = spark.createDataFrame(
        [(0, None), (1, None), (2, ""), (3, ""),
         (4, "the quick brown fox " * 10), (5, "the quick brown fox " * 10)],
        "doc_id: long, text: string",
    )
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in D.minhash_near_dup(docs, threshold=0.5).collect()}
    assert pairs[(4, 5)] == 1.0
    assert pairs[(2, 3)] == 1.0  # empty-string docs are identical docs
    assert not any(a in (0, 1) or b in (0, 1) for a, b in pairs)  # zero-union skipped


def test_embedding_near_dup_zero_vector_scores_zero(spark):
    """A zero vector must score 0.0 against everything under cosine (the
    reference's +1e-12 normalizer guard), not raise DIVIDE_BY_ZERO in ANSI
    mode."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 0.0])],
        "vec_id: long, embedding: array<double>",
    )
    pairs = {(r.id_a, r.id_b): r.score for r in
             D.embedding_near_dup(df, threshold=0.5).collect()}
    assert set(pairs) == {(1, 2)}
    blk = {(r.id_a, r.id_b): r.score for r in
           D.embedding_near_dup_blocked(df, threshold=0.5, block_size=2).collect()}
    assert set(blk) == {(1, 2)}


def test_embedding_near_dup_blocked_n_rows_hint_same_result(spark, sf_dir):
    from educational_vector_database_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(150)
    default = {(r.id_a, r.id_b): r.score
               for r in D.embedding_near_dup_blocked(emb, threshold=0.45).collect()}
    hinted = {(r.id_a, r.id_b): r.score
              for r in D.embedding_near_dup_blocked(
                  emb, threshold=0.45, n_rows=150, block_size=32).collect()}
    assert default == hinted


def test_embedding_near_dup_bucketed_subset_of_exact(spark, sf_dir):
    """Bucketed pairs must be a strict subset of the exact all-pairs result
    with BIT-EXACT scores; report recall (the documented LSH tradeoff)."""
    from educational_vector_database_spark.operators import ann as A
    from educational_vector_database_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    planes = A.hyperplanes(64, 4)
    exact = {(r.id_a, r.id_b): r.score for r in
             D.embedding_near_dup(emb, threshold=0.45).collect()}
    bucketed = {(r.id_a, r.id_b): r.score for r in
                D.embedding_near_dup_bucketed(emb, planes, threshold=0.45).collect()}
    assert set(bucketed) <= set(exact)
    assert all(exact[k] == bucketed[k] for k in bucketed)  # bit-exact


def test_embedding_near_dup_bucketed_finds_near_identical(spark):
    """Near-identical vectors (theta ~ 0) collide in the same sign-LSH bucket
    with probability ~(1-theta/pi)^4 ~ 1, so the bucketed path must find ALL
    planted high-similarity duplicates — the actual dedup workload (threshold-
    boundary pairs at cos 0.45 collide only ~18%, by design)."""
    import numpy as np

    from educational_vector_database_spark.operators import ann as A

    rng = np.random.RandomState(7)
    base = rng.randn(20, 16)
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in v + rng.randn(16) * 1e-3]))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    planes = A.hyperplanes(16, 4)
    got = {(r.id_a, r.id_b) for r in
           D.embedding_near_dup_bucketed(df, planes, threshold=0.999).collect()}
    assert got == {(2 * i, 2 * i + 1) for i in range(20)}


def test_connected_components_contraction_matches_plain(spark):
    # long chain (worst case for label depth: contraction leaves dropped
    # nodes pointing at interior labels, exercising the pointer-jumping
    # resolution) + a star + islands; contract_above=0 forces contraction
    # after every round
    import random

    rng = random.Random(7)
    chain = [(i, i + 1) for i in range(100, 140)]
    star = [(200, x) for x in range(201, 231)]
    extra = [(rng.randrange(300, 330), rng.randrange(300, 330))
             for _ in range(40)]
    edges = [(a, b) for a, b in chain + star + extra if a != b]
    pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
    plain = {r.id: r.cluster_id
             for r in D.connected_components(
                 pairs, contract_above=None).collect()}
    contracted = {r.id: r.cluster_id
                  for r in D.connected_components(
                      pairs, contract_above=0).collect()}
    assert contracted == plain
    assert plain[139] == 100 and plain[230] == 200  # sanity on shapes


def test_minhash_star_candidates_for_overcap_buckets(spark):
    # 30 exact copies with max_posting=10: the shared buckets exceed the
    # cap, so candidates degrade to the min-id star — the cluster must
    # still resolve to ONE component instead of being dropped
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and again")
         for i in range(30)]
        + [(100 + i, f"unrelated text number {i} with its own words {i}")
           for i in range(3)],
        "doc_id: long, text: string",
    )
    pairs = D.minhash_near_dup(docs, max_posting=10)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # star from the representative covers the whole copy cluster
    assert {(0, i) for i in range(1, 30)} <= got
    clusters = {r.id: r.cluster_id
                for r in D.dedup_clusters(docs, pairs).collect()}
    assert all(clusters[i] == 0 for i in range(30))
    assert all(clusters[100 + i] == 100 + i or clusters[100 + i] < 103
               for i in range(3))


def test_minhash_dedup_incremental_classifies_delta(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog every day"),
         (2, "spark shuffles data between stages when keys move around"),
         (3, "completely different text about database query optimizers")],
        "doc_id: long, text: string",
    )
    new = spark.createDataFrame(
        # 10: exact copy of 1; 11: near-dup of 2 (tail edit); 12: novel
        [(10, "the quick brown fox jumps over the lazy dog every day"),
         (11, "spark shuffles data between stages when keys move round"),
         (12, "entirely novel content with no relation to the corpus at all")],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: (r.status, r.match_id)
           for r in D.minhash_dedup_incremental(corpus, new).collect()}
    assert got[10] == ("exact_dup", 1)
    assert got[11][0] == "near_dup" and got[11][1] == 2
    assert got[12] == ("kept", None)


def test_minhash_dedup_incremental_caps_corpus_postings(spark):
    # 20 identical corpus docs: with max_posting=3 a colliding delta doc is
    # verified against only the 3 lowest corpus ids, and the best match
    # reports the lowest id (deterministic representative)
    corpus = spark.createDataFrame(
        [(i, "same boilerplate page content repeated many times over")
         for i in range(20)],
        "doc_id: long, text: string",
    )
    new = spark.createDataFrame(
        [(100, "same boilerplate page content repeated many times over again")],
        "doc_id: long, text: string",
    )
    rows = D.minhash_dedup_incremental(
        corpus, new, max_posting=3).collect()
    assert len(rows) == 1
    assert rows[0].status == "near_dup" and rows[0].match_id == 0


def test_embedding_neardup_incremental_classifies_delta(spark):
    import numpy as np

    from educational_vector_database_spark.operators import ann as A

    rng = np.random.RandomState(5)
    vecs = [[float(x) for x in rng.randn(16)] for _ in range(30)]
    corpus = spark.createDataFrame(
        [(i, vecs[i]) for i in range(30)], "vec_id: long, embedding: array<double>")
    new = spark.createDataFrame(
        # 100: exact copy of 7 (score 1.0); 101: fresh random vector
        [(100, vecs[7]), (101, [float(x) for x in rng.randn(16)])],
        "vec_id: long, embedding: array<double>")
    planes = A.hyperplanes(16, 4)
    got = {r.vec_id: (r.status, r.match_id)
           for r in D.embedding_neardup_incremental(
               corpus, new, planes, threshold=0.9).collect()}
    assert got[100] == ("near_dup", 7)
    assert got[101][0] == "kept"


def test_semantic_dedup_matches_python_replica(spark, sf_dir):
    """SemDeDup end-to-end vs a sequential NumPy replica: same assignment,
    same intra-cluster pairs, same components, same keep-rule winner."""
    import numpy as np
    from educational_vector_database_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = sorted(
        ((int(r.vec_id), np.array(r.embedding, dtype=np.float64))
         for r in emb.collect()),
        key=lambda t: t[0],
    )
    cents = [v for i, v in rows if i < 4]
    eps = 0.45

    # replica: assignment (argmin euclid, lowest-id ties)
    assign = {}
    for i, v in rows:
        dists = [float(np.sqrt(np.sum((v - c) ** 2))) for c in cents]
        assign[i] = int(np.argmin(dists))  # argmin takes first == lowest id
    # intra-cluster pairs above eps (exact cosine)
    ids = [i for i, _ in rows]
    vecs = {i: v / np.sqrt(v @ v) for i, v in rows}
    adj = {i: set() for i in ids}
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if assign[a] == assign[b] and float(vecs[a] @ vecs[b]) >= eps:
                adj[a].add(b); adj[b].add(a)
    # components -> min-id label
    label = {}
    for i in ids:
        if i in label:
            continue
        stack, comp = [i], []
        seen = {i}
        while stack:
            x = stack.pop(); comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y); stack.append(y)
        m = min(comp)
        for x in comp:
            label[x] = m
    # keep-rule: farthest from own centroid (lowest sim), ties -> lowest id
    def sim_c(i):
        v = np.array(dict(rows)[i], dtype=np.float64)
        c = cents[assign[i]]
        return float((v @ c) / (np.sqrt(v @ v) * np.sqrt(c @ c)))
    groups = {}
    for i in ids:
        groups.setdefault(label[i], []).append(i)
    keep = {}
    for g, members in groups.items():
        winner = min(members, key=lambda i: (sim_c(i), i))
        for i in members:
            keep[i] = i == winner

    got = {
        int(r.vec_id): (int(r.centroid_id), int(r.cluster_id), bool(r.keep))
        for r in D.semantic_dedup(emb, [list(c) for c in cents], eps=eps).collect()
    }
    assert len(got) == len(ids)
    for i in ids:
        assert got[i] == (assign[i], label[i], keep[i]), i


def test_semantic_dedup_keeps_exactly_one_per_group(spark):
    """Clones collapse to one survivor; the survivor is the member farthest
    from the centroid of its cell."""
    base = [1.0, 0.0, 0.0, 0.0]
    off = [0.9, 0.1, 0.0, 0.0]   # near-dup of base, farther from centroid
    far = [0.0, 0.0, 1.0, 0.0]   # own cluster
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, off), (3, far)],
        "vec_id long, embedding array<double>",
    )
    cents = [base, far]
    out = {int(r.vec_id): r for r in D.semantic_dedup(df, cents, eps=0.8).collect()}
    assert [out[i].centroid_id for i in range(4)] == [0, 0, 0, 1]
    assert [out[i].cluster_id for i in range(4)] == [0, 0, 0, 3]
    kept = [i for i in range(4) if out[i].keep]
    # group {0,1,2}: vec 2 has the lowest cosine to centroid -> survivor
    assert kept == [2, 3]


def test_semantic_dedup_no_pairs_everything_kept(spark):
    """eps above every intra-cluster similarity: the empty edge list flows
    through components without iteration and every row survives as its own
    cluster."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.7, 0.7])],
        "vec_id long, embedding array<double>",
    )
    out = {int(r.vec_id): r for r in
           D.semantic_dedup(df, [[1.0, 0.0], [0.0, 1.0]], eps=0.9999).collect()}
    assert all(out[i].keep for i in range(3))
    assert [out[i].cluster_id for i in range(3)] == [0, 1, 2]


def test_shared_span_pairs_detects_verbatim_run(spark):
    """Two docs share a verbatim 30-token block at DIFFERENT positions;
    doc C shares nothing; doc D is shorter than one shingle."""
    block = " ".join(f"tok{i}" for i in range(30))
    a = "alpha beta " + block + " gamma"
    b = "x1 y2 z3 " + block
    c = " ".join(f"other{i}" for i in range(40))
    d = "tiny doc"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "doc_id long, text string"
    )
    out = D.shared_span_pairs(
        df, shingle_tokens=8, min_span_tokens=24, max_posting=50
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.longest_span == 30 and r.n_spans == 1


def test_shared_span_pairs_splits_on_mutation(spark):
    """A single substituted token splits one long run into two islands on
    the same diagonal; spans shorter than the minimum don't qualify."""
    toks = [f"w{i}" for i in range(60)]
    orig = " ".join(toks)
    mutated = toks.copy()
    mutated[30] = "CHANGED"
    mut = " ".join(mutated)
    df = spark.createDataFrame(
        [(1, orig), (2, mut)], "doc_id long, text string"
    )
    out = D.shared_span_pairs(
        df, shingle_tokens=8, min_span_tokens=24, max_posting=50
    ).collect()
    assert len(out) == 1
    r = out[0]
    # islands: tokens 0..29 (span 30) and 31..59 (span 29), same diagonal
    assert r.longest_span == 30 and r.n_spans == 2


def test_shared_span_pairs_posting_cap_keeps_lowest_ids(spark):
    """Round-7 cap discipline (minhash's): an over-cap shingle keeps its
    ``max_posting`` LOWEST-id docs instead of dropping the whole posting —
    so earlier copies' pairs survive a high-id duplicate flood unchanged
    (never a false positive; recall loss lands on the flood only)."""
    block = " ".join(f"b{i}" for i in range(24))
    docs = [(i, f"pre{i} " + block + f" post{i}") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # every shingle of the block appears in 6 docs; cap 5 keeps docs 0-4:
    # all C(5,2)=10 pairs among them, none involving the evicted doc 5
    out = D.shared_span_pairs(
        df, shingle_tokens=8, min_span_tokens=24, max_posting=5
    ).collect()
    assert len(out) == 10 and all(r.longest_span == 24 for r in out)
    assert all(r.id_a < 5 and r.id_b < 5 for r in out)
    # raising the cap restores all 15 pairs
    out2 = D.shared_span_pairs(
        df, shingle_tokens=8, min_span_tokens=24, max_posting=50
    ).collect()
    assert len(out2) == 15 and all(r.longest_span == 24 for r in out2)
    # flood invariance: pairs among docs 0-4 identical with/without a
    # 200-copy high-id flood of the same block
    flood = [(1000 + i, block) for i in range(200)]
    df2 = spark.createDataFrame(docs + flood, "doc_id long, text string")
    base = {(r.id_a, r.id_b, r.longest_span, r.n_spans) for r in out}
    flooded = {
        (r.id_a, r.id_b, r.longest_span, r.n_spans)
        for r in D.shared_span_pairs(
            df2, shingle_tokens=8, min_span_tokens=24, max_posting=5
        ).collect()
        if r.id_a < 1000 and r.id_b < 1000
    }
    assert flooded == base


def test_span_mask_stats_interval_union(spark):
    """Masking: only the LATER doc masks; overlapping spans from two
    different earlier docs count each covered token once."""
    block = " ".join(f"s{i}" for i in range(30))
    early1 = block + " filler1 x y z"
    early2 = "aa bb " + block
    late = "p q " + block + " tail1 tail2"
    df = spark.createDataFrame(
        [(1, early1), (2, early2), (3, late)], "doc_id long, text string"
    )
    out = {int(r.doc_id): r for r in D.span_mask_stats(
        df, shingle_tokens=8, min_span_tokens=24, max_posting=50
    ).collect()}
    # doc 1 is the earliest copy: nothing masked
    assert out[1].n_masked == 0
    # doc 2 shares the block with doc 1 only -> 30 tokens masked
    assert out[2].n_masked == 30
    # doc 3 shares the SAME 30 block tokens with docs 1 AND 2 — union = 30
    assert out[3].n_masked == 30
    assert out[3].n_tokens == 34
    assert out[3].masked_ppm == 30 * 1_000_000 // 34


def test_semantic_dedup_with_trained_centroids(spark, sf_dir):
    """The production composition: MLlib-trained k-means centroids feeding
    semantic_dedup. Invariants (independent of the trained centers): every
    row verdicted exactly once, exactly one survivor per cluster, cluster
    members share the survivor's cell, singletons always kept."""
    from educational_vector_database_spark.operators import ann as A
    from educational_vector_database_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents_df = A.train_ivf_centroids(emb, n_cells=8)
    cents = [
        [float(x) for x in r.centroid]
        for r in sorted(cents_df.collect(), key=lambda r: r.centroid_id)
    ]
    out = D.semantic_dedup(emb, cents, eps=0.45).collect()
    assert len(out) == emb.count()
    by_cluster = {}
    cell_of = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
        cell_of[r.vec_id] = r.centroid_id
    for cid, members in by_cluster.items():
        assert sum(1 for m in members if m.keep) == 1
        # intra-cluster pairs were mined within one cell only
        assert len({m.centroid_id for m in members}) == 1
        if len(members) == 1:
            assert members[0].keep


def test_semantic_dedup_derived_blocking_invariant(spark, sf_dir):
    """Round-7 self-scaling: blocks_per_cell=None (the new default) derives
    the per-CELL salt from that cell's population; labels are identical to
    the round-6 pinned blocks_per_cell=4 (blocking never changes answers)."""
    from educational_vector_database_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    cents = [[1.0 if i == j else 0.0 for i in range(64)] for j in range(3)]
    derived = sorted(
        map(tuple, D.semantic_dedup(emb, cents, eps=0.3, row_cap=64).collect())
    )
    fixed = sorted(
        map(
            tuple,
            D.semantic_dedup(emb, cents, eps=0.3, blocks_per_cell=4).collect(),
        )
    )
    assert derived == fixed


def test_semantic_dedup_params_byte_derived(spark, sf_dir):
    """n_cells tracks corpus bytes (cells ~ cell_target rows) and clamps at
    the centroid-literal seam; non-file sources fall back to a count."""
    from educational_vector_database_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    p = D.semantic_dedup_params(emb, cell_target=100)
    n = emb.count()
    assert p["blocks_per_cell"] is None and p["row_cap"] == 100
    # byte-derived estimate lands within 3x of rows/target either way
    assert max(2, n // 300) <= p["n_cells"] <= max(2, (3 * n) // 100)
    assert p["n_cells"] <= 256
    # in-memory frame: count fallback, exact
    mem = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    assert D.semantic_dedup_params(mem, cell_target=10)["n_cells"] == 5


def test_cc_star_kernel_labels_match_full_pair_kernel(spark, sf_dir):
    """The star-emitting CC kernel (semantic_dedup's pair source) must
    yield bit-identical cluster labels to the full-pair kernel feeding the
    same connected_components — on real data AND under forced multi-block
    salting, where connectivity must survive per-batch thinning across
    block-pair batches."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(400)
    cents = [r.embedding for r in emb.orderBy("vec_id").limit(4).collect()]
    for row_cap in (4096, 50):  # 50 forces ~8 blocks -> 36 cross batches
        out_star = {
            (int(r.vec_id)): (int(r.cluster_id), bool(r.keep))
            for r in D.semantic_dedup(
                emb, cents, eps=0.45, row_cap=row_cap
            ).collect()
        }
        # reference: full-pair scorer -> same CC (the pre-round-7 path)
        from educational_vector_database_spark.functions import vector as V
        from educational_vector_database_spark.operators.ann import _salted_pack

        assigned = (
            emb.select(
                F.col("vec_id").alias("id"), V.as_double("embedding").alias("v")
            )
        )
        best = F.array_min(F.array(*[
            F.struct(
                V.euclidean_distance(F.col("v"), V.vector_literal(list(c))).alias("d"),
                F.lit(i).cast("int").alias("cid"),
            ) for i, c in enumerate(cents)
        ]))["cid"]
        assigned = assigned.withColumn("centroid_id", best)
        packed = _salted_pack(
            assigned.select("id", "v", "centroid_id"),
            ["centroid_id"], None, row_cap,
        )
        pairs = (
            packed.alias("a").join(
                packed.alias("b"),
                (F.col("a.centroid_id") == F.col("b.centroid_id"))
                & (F.col("a.blk") <= F.col("b.blk")),
            ).select(
                (F.col("a.blk") == F.col("b.blk")).alias("same"),
                F.col("a.rows").alias("rows_a"),
                F.col("b.rows").alias("rows_b"),
            ).mapInPandas(
                D._make_block_scorer("cosine", 0.45),
                "id_a long, id_b long, score double",
            )
        )
        comp = {int(r.id): int(r.cluster_id)
                for r in D.connected_components(pairs).collect()}
        for vid, (cid, _) in out_star.items():
            assert comp.get(vid, vid) == cid, (
                f"row_cap={row_cap}: star kernel label {cid} != "
                f"full-pair label {comp.get(vid, vid)} for {vid}")
