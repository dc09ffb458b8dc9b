"""Deduplication operators — the training-data-pipeline core.

The reference has no dedup (its store happily holds duplicates); these are the
scale extensions mandated by BASELINE.json. Five families, all engine-agnostic
deterministic (md5-based hashing, no RNG), so every one is oracle-checkable:

- exact:    fingerprint group-by (one shuffle on a 64-bit key)
- MinHash:  shingle -> per-seed min-md5 signature -> banded LSH buckets ->
            candidate pairs -> exact-Jaccard verify
- SimHash:  64-bit sign-aggregated token hash -> 4x16-bit band blocking
            (pigeonhole: hamming<=3 => >=1 band equal, so recall is EXACT for
            the declared radius) -> hamming verify
- n-gram:   exact Jaccard similarity join via inverted index (explode n-grams,
            equi-join postings, count co-occurrences) — no cross join anywhere
- embedding: cosine threshold self-join (exact all-pairs here; the LSH-bucketed
            scale path lives in operators/ann.py)

Scale notes (100 TB): every family is (map-side transform) + (equi-join or
group-by on a hash key). The only quadratic danger is a hot LSH bucket /
stop-n-gram posting list; cap those with a frequency filter (``max_posting``)
— standard practice (a shingle appearing in half the corpus carries no dedup
signal anyway). AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vector as V

HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row summary: total rows, distinct contents, duplicate rows.
    Contents compared by value; at scale group on ``fingerprint64`` instead of
    the raw text so the shuffle moves 8 bytes/row, not documents."""
    return df.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(text_col).alias("n_distinct"),
        (F.count("*") - F.countDistinct(text_col)).alias("n_duplicates"),
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep-first exact dedup: group by content fingerprint, keep the lowest
    id (deterministic survivor). ``min_by`` is a single hash aggregate —
    map-side partial min per fingerprint, then one shuffle of (fp, id)."""
    fp = T.fingerprint64(text_col)
    return (
        df.select(F.col(id_col), fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

#: Universal-hash family constants: h_i(x) = (a_i*x + b_i) mod MINHASH_P over
#: x = md5-derived 30-bit base hash. p prime (2^31-1); products stay < 2^61 so
#: the arithmetic is exact in int64 on every engine — no overflow divergence.
MINHASH_P = 2_147_483_647
MINHASH_BASE = 1 << 30


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs shared by the Spark expression and any
    SQL oracle replicating it."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, MINHASH_P)), int(rng.randint(0, MINHASH_P)))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "id",
    shingles_col: str = "sh",
    num_hashes: int = 64,
    seed: int = 42,
    keep_shingles: bool = False,
) -> DataFrame:
    """(id, shingle array) -> (id[, sh], sig array<long> of ``num_hashes``).

    One Arrow-batched ``mapInPandas`` per partition computes, per shingle, a
    30-bit base hash (first 60 bits of md5 of the UTF-8 bytes — hashlib here
    is bit-identical to SQL ``md5()``, the cross-engine primitive) and then
    the permutation surrogates ``min_x (a_i*x + b_i) mod p`` as a vectorized
    (n_shingles × num_hashes) multiply-mod-min in NumPy.

    Why Python for hashing, given "UDFs are the slow path": Spark evaluates
    higher-order-function lambdas interpreted, not codegen'd — the
    expression-level equivalents measured 6.6s (per-shingle md5 transform)
    + 10s (64 minhash transforms) at sf0.1 vs <2s for this one mapInPandas.
    All integer arithmetic (products < 2^61), so the result is bit-identical
    to the SQL oracle — the UDF changes WHERE the math runs, not what it
    computes. A mapInPandas operator node also cannot be inlined into
    downstream grouping expressions the way a pandas-UDF column can."""
    import hashlib

    import numpy as np

    params = minhash_params(num_hashes, seed)
    av = np.array([p[0] for p in params], dtype=np.int64)[None, :]
    bv = np.array([p[1] for p in params], dtype=np.int64)[None, :]
    md5 = hashlib.md5

    def run(batches):
        # shingle -> base-hash memo shared across docs in this worker: char
        # k-grams repeat heavily corpus-wide (distinct grams ≪ occurrences),
        # so memoizing cuts the md5 work several-fold at no semantic change.
        memo: dict[str, int] = {}

        def bh(s):
            # int.from_bytes(digest[:8]) >> 4 == int(hexdigest[:15], 16):
            # same first 60 md5 bits, minus the hex-string formatting that
            # dominated this inner loop (round-11 kernel profile)
            v = memo.get(s)
            if v is None:
                v = memo[s] = (
                    int.from_bytes(md5(s.encode("utf-8")).digest()[:8], "big")
                    >> 4
                ) % MINHASH_BASE
            return v

        for pdf in batches:
            out = []
            for sh in pdf[shingles_col]:
                if sh is None or len(sh) == 0:
                    out.append(np.full(num_hashes, MINHASH_P))
                    continue
                hv = np.fromiter(
                    (bh(s) for s in sh), dtype=np.int64, count=len(sh)
                )[:, None]
                out.append(((av * hv + bv) % MINHASH_P).min(axis=0))
            cols = {id_col: pdf[id_col]}
            if keep_shingles:
                cols[shingles_col] = pdf[shingles_col]
            cols["sig"] = out
            yield pd.DataFrame(cols)

    passthrough = f", {shingles_col} array<string>" if keep_shingles else ""
    return df.select(id_col, shingles_col).mapInPandas(
        run, f"{id_col} long{passthrough}, sig array<long>"
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a NARROW input up to the session's default parallelism
    before a Python-kernel stage. A small corpus often arrives as 1-2 parquet
    splits, which would serialize the mapInPandas work onto one worker; the
    shuffle moved is tiny (the narrow projection). A corpus already split
    wider than the default parallelism (the 100 TB case) is left untouched —
    no shuffle is added at scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _uniq_shingles(t: str | None, k: int):
    """Sorted unique char k-shingles as a NumPy ``S{k}`` array — element-for-
    element equal (as byte strings) to functions/text.py char_shingles
    (1-based substr(i, k) over sequence(1, greatest(1, len-k+1))) on the
    ASCII-normalized text, and to the DuckDB oracle's substr comprehension.

    Vectorized: sliding_window_view + np.unique run in C, so a 10 kB doc
    costs one O(n log n) sort instead of 10k Python slice/set operations.
    NULL -> empty array (matches the expression's null-filtered array);
    '' -> [''] (substr of '' is ''). Short (<k) docs store their whole text;
    NUL padding inside the S dtype cannot collide with real windows because
    normalized text is NUL-free ASCII."""
    import numpy as np

    if t is None:
        return np.empty(0, dtype=f"S{k}")
    b = t.encode("utf-8")
    if len(b) <= k:
        return np.array([b], dtype=f"S{k}")
    a = np.frombuffer(b, dtype=np.uint8)
    w = np.ascontiguousarray(np.lib.stride_tricks.sliding_window_view(a, k))
    return np.unique(w.view(f"S{k}").ravel())


def _minhash_from_text(
    norm: DataFrame, shingle_k: int, num_hashes: int, seed: int = 42
) -> DataFrame:
    """(id, t normalized) -> (id, t, sig): shingle by slicing + minhash in ONE
    Arrow hop. Versus shipping shingle ARRAYS into minhash_signatures, the
    transfer is ~k× smaller (k-grams overlap) and the interpreted
    char_shingles expression leaves the hot path entirely; the math is the
    same memoized md5 -> (a*x+b) mod p column-min, bit-identical to the SQL
    oracle."""
    import hashlib

    import numpy as np

    params = minhash_params(num_hashes, seed)
    av = np.array([p[0] for p in params], dtype=np.int64)[None, :]
    bv = np.array([p[1] for p in params], dtype=np.int64)[None, :]
    md5 = hashlib.md5
    k = shingle_k

    def run(batches):
        memo: dict[bytes, int] = {}

        def bh(s: bytes) -> int:
            # digest-slice form of int(hexdigest[:15], 16) — see
            # minhash_signatures' bh: same 60 bits, no hex formatting
            v = memo.get(s)
            if v is None:
                v = memo[s] = (
                    int.from_bytes(md5(s).digest()[:8], "big") >> 4
                ) % MINHASH_BASE
            return v

        for pdf in batches:
            out = []
            for t in pdf["t"]:
                sh = _uniq_shingles(t, k)
                if sh.size == 0:
                    out.append(np.full(num_hashes, MINHASH_P))
                    continue
                # iterating an S-dtype array yields the shingle bytes (NUL
                # padding stripped) == utf-8 of the substr shingle string
                hv = np.fromiter(
                    (bh(s) for s in sh), dtype=np.int64, count=sh.size
                )[:, None]
                out.append(((av * hv + bv) % MINHASH_P).min(axis=0))
            yield pd.DataFrame({"id": pdf["id"], "t": pdf["t"], "sig": out})

    return norm.select("id", "t").mapInPandas(run, "id long, t string, sig array<long>")


def minhash_near_dup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    num_hashes: int = 64,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    max_posting: int = 1000,
) -> DataFrame:
    """MinHash/LSH near-duplicate pairs, exact-verified.

    Banding defaults (b=16, r=4) put the S-curve knee near jaccard 0.55:
    P(candidate|s) = 1-(1-s^4)^16 — ~0.64 at s=0.5, ~0.97 at s=0.7, while
    s=0.3 boilerplate-similarity pairs (the bulk of a template-heavy corpus)
    collide at only ~0.12, keeping the candidate set near-linear.

    Pipeline: normalize (expression) -> shingle+signature (one mapInPandas,
    shingling by Python slicing — identical to substr semantics on the
    ASCII-normalized text) -> explode bands -> groupBy (band_idx, band_key)
    collecting member ids -> generate in-bucket pairs -> distinct candidate
    pairs -> join the NORMALIZED TEXT back -> exact Jaccard verify (re-
    shingles per pair in the kernel). Returns ``(id_a, id_b, jaccard)`` with
    id_a < id_b.

    Carrying text instead of shingle arrays is the scale choice: a k-gram
    array is ~k× the text bytes, so the persist, the bucket shuffle feed and
    both verify joins move ~5× less data, and the interpreted char_shingles
    expression disappears from the hot path (re-slicing in the kernel is
    cheaper than one Arrow transfer of the arrays). Buckets bigger than
    ``max_posting`` degrade from all-pairs to min-id STAR candidates —
    O(bucket) instead of O(bucket²) — so a giant dup cluster stays
    connected through its representative instead of being dropped."""
    n_bands = num_hashes // rows_per_band
    norm = _spread(
        df.select(F.col(id_col).alias("id"), T.normalized_text(text_col).alias("t"))
    )
    # (id, t, sig) feeds three plan branches (banding + both verify joins);
    # persist the one expensive map instead of recomputing it per branch.
    # MEMORY_AND_DISK (default): at corpus scale this spills rather than evicts.
    # The count() is a deliberate cache-fill, not wasted work: the three
    # branches are independent shuffle-map stages that Spark schedules
    # CONCURRENTLY, so on a cold cache they race and each computes the
    # signature partitions (and spawns its own Python workers) — measured
    # 2.4x slower end-to-end than filling the cache once first.
    base = _minhash_from_text(norm, shingle_k, num_hashes).persist()
    base.count()

    # band key = STRUCT of the band's r signature values: groupBy hashes /
    # shuffles 8r bytes per row instead of a ~70-char concat string, and no
    # string materializes at all. Equality semantics identical (struct
    # equality is fieldwise), so the candidate set is unchanged.
    bands = base.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        *[
                            F.col("sig")[b * rows_per_band + r].alias(f"h{r}")
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    buckets = (
        bands.groupBy("band_idx", "band_key")
        .agg(F.collect_list("id").alias("ids"))
        # singleton buckets yield no pairs
        .filter(F.size("ids") >= 2)
    )
    # in-cap buckets: all ordered pairs (sort member ids, pair each with its
    # successors — id_a < id_b by construction). Over-cap buckets — a GIANT
    # dup cluster (10k copies of a boilerplate page) or stop-shingle sludge
    # — would cost O(cap²) per bucket with no extra connectivity, so they
    # degrade to STAR candidates instead: the bucket's MIN id paired with
    # every other member, O(bucket) pairs. The exact-Jaccard verify still
    # applies per pair, and connected components restores the full cluster
    # through the representative. (Near-dup similarity is not transitive,
    # so a star member whose direct similarity to the representative falls
    # below threshold is dropped where an all-pairs bucket might have kept
    # it via another member — the standard recall trade at this corpus
    # pathology; buckets under the cap are unaffected.)
    pair_struct = T._bind(
        F.array_sort("ids"),
        lambda ids: F.when(
            F.size(ids) <= max_posting,
            F.flatten(
                F.transform(
                    ids,
                    lambda x, i: F.transform(
                        F.slice(ids, i + 2, F.size(ids)),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            ),
        ).otherwise(
            F.transform(
                F.slice(ids, 2, F.size(ids)),
                lambda y: F.struct(
                    F.element_at(ids, 1).alias("id_a"), y.alias("id_b")
                ),
            )
        ),
    )
    cand = (
        buckets.select(F.explode(pair_struct).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    # equi-joins on id: AQE broadcasts the text side when it is small and
    # falls back to shuffle join at corpus scale (no forced-broadcast hint —
    # the text table is linear in corpus size). The Jaccard itself runs
    # vectorized in mapInPandas: each pair re-shingles by slicing (identical
    # sets to the signature stage) and |A∪B| = |A|+|B|-|A∩B| so one set op
    # per pair. Integer sizes -> double at the end: exact, order-free,
    # bit-identical to the SQL oracle.
    txt = base.select("id", "t")
    pairs = cand.join(
        txt.select(F.col("id").alias("id_a"), F.col("t").alias("t_a")), "id_a"
    ).join(
        txt.select(F.col("id").alias("id_b"), F.col("t").alias("t_b")), "id_b"
    )
    thr = float(threshold)
    k = shingle_k

    def jaccard(batches):
        # a doc appears in MANY candidate pairs (avg pair fan-out ≫ 1), so
        # shingle each distinct doc once per worker and keep the python-set
        # form for O(min(|A|,|B|)) C-dict intersections
        memo: dict[int, frozenset] = {}

        def sh_of(i: int, t) -> frozenset:
            v = memo.get(i)
            if v is None:
                v = memo[i] = frozenset(_uniq_shingles(t, k).tolist())
            return v

        for pdf in batches:
            ida, idb, jc = [], [], []
            for a, b, ta, tb in zip(
                pdf["id_a"], pdf["id_b"], pdf["t_a"], pdf["t_b"]
            ):
                # NULL texts shingle to the empty set yet share the sentinel
                # signature, so they DO become candidates: skip zero-union
                # pairs instead of dividing 0/0
                x = sh_of(a, ta)
                y = sh_of(b, tb)
                c = len(x & y)
                u = len(x) + len(y) - c
                if u == 0:
                    continue
                j = c / u
                if j >= thr:
                    ida.append(a)
                    idb.append(b)
                    jc.append(j)
            yield pd.DataFrame(
                {"id_a": ida, "id_b": idb, "jaccard": jc}
            ).astype({"id_a": "int64", "id_b": "int64", "jaccard": "float64"})

    return pairs.mapInPandas(jaccard, "id_a long, id_b long, jaccard double")


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs existing corpus (never corpus vs corpus)
# ---------------------------------------------------------------------------

def minhash_dedup_incremental(
    corpus: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    num_hashes: int = 64,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    max_posting: int = 1000,
    persists_out: list | None = None,
) -> DataFrame:
    """Classify every NEW doc against an EXISTING corpus — the continual-
    ingest shape: at 100 TB you dedup the daily delta against the corpus,
    you never re-dedup the corpus against itself. Work on the corpus side
    is one banding scan (linear, shared with index maintenance); the only
    join is delta-bands × corpus-bands on the band key, so cost tracks
    O(|new| + collisions), not O(|corpus|²).

    Returns one row per new doc: ``(doc_id, status, match_id, jaccard)``:

    - ``exact_dup`` — normalized text fingerprint already in the corpus;
      ``match_id`` is the lowest matching corpus id, jaccard NULL.
    - ``near_dup`` — exact Jaccard ≥ threshold vs some corpus doc;
      ``match_id``/``jaccard`` are the BEST match (highest jaccard,
      lowest corpus id tie-break).
    - ``kept`` — survives; match_id/jaccard NULL.

    Same signature/banding math as :func:`minhash_near_dup` (shared
    ``_minhash_from_text`` kernel, same (a,b) constants — oracle-checkable
    with the same SQL building blocks). Corpus band postings above
    ``max_posting`` keep only the ``max_posting`` LOWEST corpus ids
    (deterministic): a delta doc landing in a giant corpus bucket is
    verified against the representatives instead of the whole bucket —
    the one-sided analog of the self-join's star degradation, and the
    same documented recall trade."""
    n_bands = num_hashes // rows_per_band

    def _norm(df: DataFrame) -> DataFrame:
        return _spread(
            df.select(F.col(id_col).alias("id"), T.normalized_text(text_col).alias("t"))
        )

    def _bands(base: DataFrame) -> DataFrame:
        return base.select(
            "id",
            F.posexplode(
                F.array(
                    *[
                        F.struct(
                            *[
                                F.col("sig")[b * rows_per_band + r].alias(f"h{r}")
                                for r in range(rows_per_band)
                            ]
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("band_idx", "band_key"),
        )

    norm_new = _norm(new)
    norm_corp = _norm(corpus)
    base_new = _minhash_from_text(norm_new, shingle_k, num_hashes)
    base_corp = _minhash_from_text(norm_corp, shingle_k, num_hashes)
    if persists_out is not None:
        # The signature kernel feeds TWO plan branches (exact kill +
        # banding); persisting materializes it once. The cache outlives
        # this call (it backs the returned lazy plan), so the CALLER owns
        # unpersisting after consuming the result (e.g. a foreachBatch sink
        # releases per micro-batch). Without persists_out nothing is
        # persisted — each branch recomputes the signatures, slower but
        # leak-free for direct callers that never clean up (round-6 ADVICE:
        # the old unconditional persist accreted cached blocks per call).
        base_new = base_new.persist()
        base_new.count()
        base_corp = base_corp.persist()
        base_corp.count()
        persists_out.extend([base_new, base_corp])

    # exact kill: 8-byte fingerprint anti-join semantics, lowest corpus id
    # reported (min aggregate BEFORE the join: the corpus side shuffles one
    # row per distinct fingerprint, not per doc)
    corp_fp = (
        base_corp.select(T.fingerprint64("t").alias("fp"), "id")
        .groupBy("fp")
        .agg(F.min("id").alias("exact_match_id"))
    )
    new_fp = base_new.select("id", T.fingerprint64("t").alias("fp"))
    exact = new_fp.join(corp_fp, "fp").select(
        F.col("id").alias("new_id"), "exact_match_id"
    )

    # candidate generation: delta bands x capped corpus postings
    corp_bands = _bands(base_corp)
    if max_posting is not None:
        w = Window.partitionBy("band_idx", "band_key").orderBy("id")
        corp_bands = (
            corp_bands.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= max_posting)
            .drop("rn")
        )
    cand = (
        _bands(base_new)
        .select("band_idx", "band_key", F.col("id").alias("new_id"))
        .join(
            corp_bands.select(
                "band_idx", "band_key", F.col("id").alias("corp_id")
            ),
            ["band_idx", "band_key"],
        )
        .select("new_id", "corp_id")
        .distinct()
    )
    pairs = cand.join(
        base_new.select(F.col("id").alias("new_id"), F.col("t").alias("t_a")),
        "new_id",
    ).join(
        base_corp.select(F.col("id").alias("corp_id"), F.col("t").alias("t_b")),
        "corp_id",
    )
    thr = float(threshold)
    k = shingle_k

    def jaccard(batches):
        memo: dict[tuple[int, int], frozenset] = {}

        def sh_of(side: int, i: int, t) -> frozenset:
            key = (side, i)
            v = memo.get(key)
            if v is None:
                v = memo[key] = frozenset(_uniq_shingles(t, k).tolist())
            return v

        for pdf in batches:
            na, ca, jc = [], [], []
            for a, b, ta, tb in zip(
                pdf["new_id"], pdf["corp_id"], pdf["t_a"], pdf["t_b"]
            ):
                x = sh_of(0, a, ta)
                y = sh_of(1, b, tb)
                c = len(x & y)
                u = len(x) + len(y) - c
                if u == 0:
                    continue
                j = c / u
                if j >= thr:
                    na.append(a)
                    ca.append(b)
                    jc.append(j)
            yield pd.DataFrame({"new_id": na, "corp_id": ca, "jaccard": jc}).astype(
                {"new_id": "int64", "corp_id": "int64", "jaccard": "float64"}
            )

    near_all = pairs.mapInPandas(jaccard, "new_id long, corp_id long, jaccard double")
    best_w = Window.partitionBy("new_id").orderBy(
        F.desc("jaccard"), F.asc("corp_id")
    )
    near = (
        near_all.withColumn("rn", F.row_number().over(best_w))
        .filter(F.col("rn") == 1)
        .select("new_id", F.col("corp_id").alias("near_match_id"), "jaccard")
    )

    return (
        base_new.select(F.col("id").alias("new_id"))
        .join(exact, "new_id", "left")
        .join(near, "new_id", "left")
        .select(
            F.col("new_id").alias(id_col),
            F.when(F.col("exact_match_id").isNotNull(), F.lit("exact_dup"))
            .when(F.col("near_match_id").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.coalesce("exact_match_id", "near_match_id").alias("match_id"),
            F.when(F.col("exact_match_id").isNull(), F.col("jaccard"))
            .alias("jaccard"),
        )
    )


def embedding_neardup_incremental(
    corpus: DataFrame,
    new: DataFrame,
    planes: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.45,
    metric: str = "cosine",
    max_posting: int = 1000,
) -> DataFrame:
    """Embedding-modality twin of :func:`minhash_dedup_incremental`: classify
    a DELTA batch of vectors against the corpus without self-joining either
    side. Candidates come from a sign-LSH bucket equi-join (bucket id is a
    pure scan expression, operators/ann.py bucket_expr — the same blocking
    as :func:`embedding_near_dup_bucketed` and the same documented recall
    trade); the verify is the exact similarity column expression (JVM-side
    HOF fold, bit-identical to the SQL oracle's dot/sqrt formula).

    Returns ``(id, status, match_id, score)`` per new vector — ``near_dup``
    with the BEST corpus match (highest score, lowest corpus id tie-break)
    when the verified similarity clears ``threshold``, else ``kept``.
    Corpus rows above ``max_posting`` per bucket keep the lowest ids only
    (deterministic representatives, same cap contract as the minhash
    incremental). Cost: one scan of each side + an equi-join keyed by a
    small int — O(|delta| + collisions) per ingest. The delta projection
    is deliberately NOT persisted despite feeding two plan branches
    (candidates + the final left join): it is a single narrow
    scan-and-project with no Python hop, so recomputing it is cheaper
    than a cache fill — unlike the minhash twin, whose signature kernel
    IS worth caching."""
    from . import ann as A

    m = metric.lower()
    if m not in V.SUPPORTED_METRICS:
        raise ValueError(f"Unknown metric: {metric!r}. Supported: {V.SUPPORTED_METRICS}")

    def prep(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            V.as_double(vector_col).alias("v"),
            A.bucket_expr(vector_col, planes).alias("bkt"),
        )

    corp = prep(corpus)
    if max_posting is not None:
        w = Window.partitionBy("bkt").orderBy("id")
        corp = (
            corp.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= max_posting)
            .drop("rn")
        )
    delta = prep(new)
    scored = (
        delta.select(F.col("id").alias("new_id"), F.col("v").alias("v_n"), "bkt")
        .join(
            corp.select(F.col("id").alias("corp_id"), F.col("v").alias("v_c"), "bkt"),
            "bkt",
        )
        .select(
            "new_id",
            "corp_id",
            V.similarity(m, F.col("v_n"), F.col("v_c")).alias("score"),
        )
        .filter(F.col("score") >= F.lit(float(threshold)))
    )
    best_w = Window.partitionBy("new_id").orderBy(F.desc("score"), F.asc("corp_id"))
    best = (
        scored.withColumn("rn", F.row_number().over(best_w))
        .filter(F.col("rn") == 1)
        .select("new_id", F.col("corp_id").alias("match_id"), "score")
    )
    return (
        delta.select(F.col("id").alias("new_id"))
        .join(best, "new_id", "left")
        .select(
            F.col("new_id").alias(id_col),
            F.when(F.col("match_id").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            "match_id",
            "score",
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact similarity join, inverted index)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_posting: int = 1000,
) -> DataFrame:
    """EXACT Jaccard >= threshold pairs over word n-gram sets, computed as an
    inverted-index join (explode n-grams -> equi-join postings -> count common
    n-grams per pair -> |A∩B| / (|A|+|B|-|A∩B|)). Never materializes a cross
    join: cost is Σ posting_list² per n-gram, capped by ``max_posting``.

    Exactness caveat at the cap: a pair sharing ONLY capped n-grams is missed —
    with threshold >= 0.5 such a pair needs half its grams capped, i.e. it is
    stop-gram sludge, not a near-duplicate."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(T.word_ngrams(text_col, n)).alias("g"),
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    # NO forced broadcasts below: `sizes` is one row PER DOCUMENT and the
    # hot-gram list grows with the corpus — a broadcast hint on either OOMs
    # executors at 10^9 docs. AQE picks broadcast at runtime when a side
    # actually fits (plan-asserted in tests/test_plans.py).
    posting_ok = grams.groupBy("g").agg(F.count("*").alias("pn"))
    grams = grams.join(
        posting_ok.filter(F.col("pn") > max_posting), "g", "left_anti"
    )
    common = (
        grams.alias("a")
        .join(
            grams.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("c"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("c").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("c")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_posting: int = 1000,
) -> DataFrame:
    """EXCERPT/QUOTATION detection: pairs where the smaller document's
    n-gram set is mostly CONTAINED in the other — ``|A∩B| / min(|A|,|B|)``
    ≥ threshold. Jaccard misses these on purpose (a 50-gram quote inside a
    5000-gram article has Jaccard ≈ 0.01 but containment ≈ 1.0), and
    training-data curation needs exactly this asymmetric signal to catch
    boilerplate inclusion and wholesale quoting. Same inverted-index shape
    (and the same no-forced-broadcast rule) as :func:`ngram_jaccard_pairs`
    — one posting equi-join, never a cross join."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(T.word_ngrams(text_col, n)).alias("g"),
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    posting_ok = grams.groupBy("g").agg(F.count("*").alias("pn"))
    grams = grams.join(
        posting_ok.filter(F.col("pn") > max_posting), "g", "left_anti"
    )
    common = (
        grams.alias("a")
        .join(
            grams.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("c"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("c").cast("double")
                / F.least("sz_a", "sz_b").cast("double")
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _nibble_value(ch: Column) -> Column:
    """hex char -> 0..15, via position in the hex alphabet (cross-engine:
    DuckDB ``strpos`` computes the identical thing)."""
    return F.instr(F.lit(HEX), ch) - 1


def simhash_hex(text: Column | str, as_nibbles: bool = False) -> Column:
    """64-bit SimHash over the distinct word tokens of the normalized text,
    returned as a 16-char hex string (or the 16 nibble ints).

    Definition (deterministic, engine-agnostic): token hash = first 16 hex
    chars of md5(token); for each of the 64 bit positions, bit = 1 iff strictly
    more tokens have the bit set than clear. Built nibble-wise: for hex
    position p and bit k, count tokens whose nibble p has bit k — all pure
    integer Column arithmetic, codegen'd, no UDF."""
    def _build(toks: Column) -> Column:
        # bind the token-md5 array too: each of the 64 bit filters below scans
        # it, and without binding every scan would re-md5 every token
        def _with_hashes(hs: Column) -> Column:
            n = F.size(hs)

            def _bit_count(p: int, k: int) -> Column:
                # tokens whose md5 nibble at position p has bit k set
                def _has_bit(h: Column) -> Column:
                    v = _nibble_value(F.substring(h, p + 1, 1))
                    return F.floor(v / (2 ** k)) % 2 == 1

                return F.size(F.filter(hs, _has_bit))

            nibbles = [
                sum(
                    F.when(_bit_count(p, k) * 2 > n, F.lit(1 << k)).otherwise(F.lit(0))
                    for k in range(4)
                )
                for p in range(16)
            ]
            if as_nibbles:
                return F.array(*[c.cast("int") for c in nibbles])
            return F.concat(
                *[F.substring(F.lit(HEX), c.cast("int") + 1, 1) for c in nibbles]
            )

        return T._bind(F.transform(toks, F.md5), _with_hashes)

    return T._bind(
        F.array_distinct(F.split(T.normalized_text(text), " ")), _build
    )


def simhash_signatures(
    df: DataFrame, id_col: str = "id", tokens_col: str = "toks"
) -> DataFrame:
    """(id, distinct-token array) -> (id, sh 16-hex-char simhash).

    Bit-identical to :func:`simhash_hex` (tested), but vectorized: md5 per
    token in hashlib (same bytes as SQL ``md5``), then one
    ``unpackbits``/majority pass in NumPy per doc instead of 64 interpreted
    bit-count filters per doc (measured ~10x at sf0.1). Bit layout matches
    the nibble definition: hex char p, bit k == unpacked bit index
    ``4p + (3-k)`` (unpackbits is MSB-first)."""
    import hashlib

    import numpy as np

    md5 = hashlib.md5

    def run(batches):
        # token -> 8-byte digest memo, shared across every doc this worker
        # sees: corpus vocabulary is tiny next to total token occurrences
        # (Zipf), so this cuts md5 calls ~10-20x. Bounded: natural-language
        # vocabularies are millions of entries at most (~100 MB worst case).
        memo: dict[str, bytes] = {}

        def h8(t):
            d = memo.get(t)
            if d is None:
                d = memo[t] = md5(t.encode("utf-8")).digest()[:8]
            return d

        for pdf in batches:
            out = []
            out64 = []
            for toks in pdf[tokens_col]:
                n = len(toks)
                if n == 0:
                    out.append("0" * 16)
                    out64.append(0)
                    continue
                raw = np.frombuffer(
                    b"".join(h8(t) for t in toks), dtype=np.uint8
                ).reshape(n, 8)
                ones = np.unpackbits(raw, axis=1).sum(axis=0)  # (64,) MSB-first
                maj = (ones * 2 > n).astype(np.uint8)
                packed = np.packbits(maj).reshape(8).tobytes()  # 8 bytes, MSB first
                out.append(packed.hex())
                # the SAME 64 bits as a signed int64: banding keys become
                # shift/mask ints and hamming one bit_count(xor) downstream
                out64.append(int.from_bytes(packed, "big", signed=True))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "sh": out, "sh64": out64}
            ).astype({"sh64": "int64"})

    return df.select(id_col, tokens_col).mapInPandas(
        run, f"{id_col} long, sh string, sh64 long"
    )


def simhash_near_dup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_posting: int = 1000,
) -> DataFrame:
    """SimHash near-duplicate pairs with hamming distance <= max_hamming.

    Blocking: split the 64-bit hash into 4 x 16-bit bands; by pigeonhole any
    pair within hamming 3 agrees on at least one full band, so the 4-way
    band equi-join has EXACT recall for the declared radius — this is the
    standard web-scale simhash join (Manku et al., WWW'07), expressed as one
    band group-by + in-bucket pair generation (signatures computed ONCE; the
    int64 signature rides in the bucket struct so verification joins nothing
    back). Band keys are shift/mask ints of the packed int64 signature and
    verify is ONE ``bit_count(xor)`` per pair — not 16 per-nibble string ops.
    Returns ``(id_a, id_b, hamming)``.

    ``max_posting`` caps bucket size exactly like minhash's: one degenerate
    band key (e.g. every empty doc simhashes to ``0000``) would otherwise
    generate pairs quadratically at corpus scale. Recall caveat at the cap: a
    pair agreeing ONLY on over-cap bands is missed — but an over-cap band
    value is shared by >max_posting docs, i.e. it is a degenerate band
    carrying no near-dup signal, the same argument as ngram's stop-gram cap."""
    src = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")))
    base = simhash_signatures(
        src.select(
            "id",
            F.array_distinct(F.split(T.normalized_text("__t"), " ")).alias("toks"),
        )
    )
    bands = base.select(
        "id",
        "sh64",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sh64", 48 - 16 * b)
                    .bitwiseAND(F.lit(0xFFFF))
                    .cast("int")
                    for b in range(4)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    buckets = (
        bands.groupBy("band_idx", "band_key")
        .agg(F.collect_list(F.struct("id", "sh64")).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= max_posting))
    )
    pair_struct = T._bind(
        F.array_sort("ms"),  # struct sort: by id asc (id is first field)
        lambda ms: F.flatten(
            F.transform(
                ms,
                lambda x, i: F.transform(
                    F.slice(ms, i + 2, F.size(ms)),
                    lambda y: F.struct(
                        x.id.alias("id_a"),
                        y.id.alias("id_b"),
                        x.sh64.alias("a64"),
                        y.sh64.alias("b64"),
                    ),
                ),
            )
        ),
    )
    # Verify BEFORE dedup: hamming is one codegen'd bit_count(xor) per row,
    # so computing it on the (≤4x duplicated) candidate stream is nearly
    # free, and the global distinct then shuffles (id_a, id_b, hamming) —
    # three narrow ints already filtered to true near-dups — instead of wide
    # rows carrying two 16-char signatures. Exact regardless of which band(s)
    # produced a pair.
    ham = F.bit_count(F.col("a64").bitwiseXOR(F.col("b64")))
    return (
        buckets.select(F.explode(pair_struct).alias("p"))
        .select("p.id_a", "p.id_b", "p.a64", "p.b64")
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# connected components: near-dup pairs -> cluster ids -> dedup survivors
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    contract_above: int = 200_000,
) -> DataFrame:
    """Undirected edges -> ``(id, cluster_id)`` where cluster_id is the MIN id
    reachable from ``id`` (the canonical survivor of a dedup cluster).

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; converged when no label
    changes. Rounds = graph diameter (near-dup clusters are dense, so
    usually 2-3). Each round is one join + one groupBy — all shuffles on the
    8-byte id, and the edge list is the small near-dup output, not the
    corpus. The per-round ``localCheckpoint`` truncates the lineage so the
    plan stays flat across iterations (the classic iterative-algorithm
    requirement on Spark).

    Large-cluster contraction (the adversarial-input guard): an edge list
    above ``contract_above`` rows is CONTRACTED after each round — both
    endpoints rewritten to their current labels, self-loops dropped,
    re-deduplicated — so a giant dup cluster's edges collapse onto its
    min-label star after the first round instead of being re-joined at
    full size every round (per-round work then tracks the SHRINKING
    contracted graph, not the original pair count). Contraction leaves
    non-representative nodes holding stale interior labels, so a
    pointer-jumping resolution pass (label := label's label, doubling the
    compressed depth per round) follows the main loop; with contraction
    off it converges in zero rounds. This is the large-star/small-star
    family's trade: 2 extra joins per hot round, bounded total work."""
    # LAZY checkpoint: the census count (or, with contraction off, round
    # 1's convergence action) materializes the one shared RDD — no
    # separate blocking checkpoint job (guide §1.2: the sf0.1 suite is
    # driver-bound, each action ~0.1-0.3 s of scheduler+planning floor).
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_edges = edges.count() if contract_above is not None else None
    did_contract = False
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.id)
            .groupBy("a")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        # ONE job per round: the new label rides with a per-row changed flag
        # (labels only ever decrease, so changed == nmin < old), the
        # checkpoint is lazy, and the max(flag) aggregation both materializes
        # the checkpointed round and answers the convergence test — the old
        # shape paid a second job (eager checkpoint, then a join-based diff).
        lowered = F.least(F.col("cluster_id"), F.coalesce("nmin", F.col("cluster_id")))
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                lowered.alias("cluster_id"),
                (lowered < F.col("cluster_id")).cast("int").alias("__chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(F.max("__chg")).head()[0]
        labels = new_labels.drop("__chg")
        if not changed:
            break
        if n_edges is not None and n_edges > contract_above:
            und = (
                edges.join(
                    labels.select(F.col("id").alias("a"),
                                  F.col("cluster_id").alias("la")), "a")
                .join(
                    labels.select(F.col("id").alias("b"),
                                  F.col("cluster_id").alias("lb")), "b")
                .select(F.least("la", "lb").alias("a"),
                        F.greatest("la", "lb").alias("b"))
                .filter(F.col("a") < F.col("b"))
                .distinct()
            )
            edges = (
                und.union(und.select(F.col("b").alias("a"),
                                     F.col("a").alias("b")))
                .localCheckpoint(eager=False)  # census count materializes
            )
            n_edges = edges.count()
            did_contract = True
    # pointer jumping: contraction can leave a dropped node pointing at an
    # interior node whose own label kept falling; chase cluster_id through
    # labels until fixpoint (depth halves each round — O(log chain)).
    # Without contraction the propagation fixpoint is already
    # chase-stable, so the pass is skipped entirely.
    for _ in range(max_iter if did_contract else 0):
        parent = labels.select(F.col("id").alias("pid"),
                               F.col("cluster_id").alias("pl"))
        resolved_label = F.coalesce("pl", "cluster_id")
        new_labels = (
            labels.join(parent, labels.cluster_id == parent.pid, "left")
            .select(
                "id",
                resolved_label.alias("cluster_id"),
                (resolved_label < F.col("cluster_id")).cast("int")
                .alias("__chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(F.max("__chg")).head()[0]
        labels = new_labels.drop("__chg")
        if not changed:
            break
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full dedup resolution: near-dup pairs -> clusters -> per-doc verdict.
    Returns ``(id, cluster_id, is_survivor)`` for every document; docs in no
    cluster survive trivially as their own cluster."""
    comp = connected_components(pairs)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id",
            F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
        )
        .withColumn("is_survivor", F.col("id") == F.col("cluster_id"))
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (exact; LSH scale path in operators/ann.py)
# ---------------------------------------------------------------------------

def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.45,
    metric: str = "cosine",
) -> DataFrame:
    """All-pairs similarity >= threshold (id_a < id_b). Exact pair join —
    quadratic by definition; at corpus scale run it per-LSH-bucket
    (operators/ann.py bucketizes first) so each block is small.

    For cosine, vectors are unit-normalized ONCE per row before the join so
    the per-pair work is a single dot product (the two norms would otherwise
    be recomputed for every one of the O(n²) pairs). Score is therefore
    ``dot(a/|a|, b/|b|)`` — same op order as the SQL oracle."""
    if metric.lower() == "cosine":
        a = df.select(
            F.col(id_col).alias("id_a"), V.l2_normalize(V.as_double(vector_col), eps=0.0).alias("va")
        )
        b = df.select(
            F.col(id_col).alias("id_b"), V.l2_normalize(V.as_double(vector_col), eps=0.0).alias("vb")
        )
        score = V.dot_product(F.col("va"), F.col("vb"))
    else:
        a = df.select(F.col(id_col).alias("id_a"), V.as_double(vector_col).alias("va"))
        b = df.select(F.col(id_col).alias("id_b"), V.as_double(vector_col).alias("vb"))
        score = V.similarity(metric, F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score.alias("score"))
        .filter(F.col("score") >= threshold)
    )


def embedding_near_dup_blocked(
    df: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.45,
    metric: str = "cosine",
    block_size: int = 1024,
    n_rows: int | None = None,
) -> DataFrame:
    """All-pairs similarity >= threshold via Arrow-batched block matrix math.

    The scale path for exact near-dup mining: pack rows into ~``block_size``
    blocks, join block pairs (upper triangle), and score each block pair in
    one vectorized NumPy pass inside ``mapInPandas``. Per pair of blocks the
    dot products accumulate dimension-by-dimension (``acc += outer(A_i, B_i)``)
    — the exact IEEE op order of the fold in functions/vector.py and of the
    SQL oracle, so results are bit-identical to :func:`embedding_near_dup`
    while running ~10x faster (no per-pair array allocation, BLAS-free exact
    math). Only pairs >= threshold leave Python, so Arrow output is tiny.

    O(n²/block²) block pairs: quadratic like every exact all-pairs — at corpus
    scale bucketize first (operators/ann.py) and run this inside buckets."""
    import math

    m = metric.lower()
    if m not in V.SUPPORTED_METRICS:
        raise ValueError(f"Unknown metric: {metric!r}. Supported: {V.SUPPORTED_METRICS}")
    src = df.select(F.col(id_col).alias("id"), V.as_double(vector_col).alias("v"))
    # The RESULT is independent of the blocking (every pair is scored exactly
    # once either way), so n_blocks only tunes granularity. Prefer a caller
    # hint; otherwise size blocks from driver-side FILE metadata — no eager
    # count() job, and unlike a partition-count heuristic it tracks data
    # volume (a 798 KB table in 1 partition must NOT get 32 blocks: block
    # pairs grow quadratically, and 528 tiny GEMMs are pure Python overhead
    # — measured 6x slower than 3 big ones). ~400 B/row of parquet for a
    # 64-dim float vector row, so block_size rows ≈ 400 KB of file; higher
    # dims shift bytes/row up and blocks shrink proportionally, which is the
    # right direction (GEMM cost per block scales with dim too). No
    # parallelism floor: padding n_blocks up re-ships every block in O(n)
    # extra pairs (measured 2x slower end-to-end at 800 KB input than 3 fat
    # pairs on 3 cores), and at real scale the byte-derived count is already
    # far above the core count.
    if n_rows is not None:
        n_blocks = max(1, math.ceil(n_rows / block_size))
    else:
        bytes_per_block = block_size * 400
        paths = [p.removeprefix("file:") for p in src.inputFiles()]
        total = 0
        for p in paths:
            try:
                total += os.path.getsize(p)
            except OSError:
                # unreadable/remote path: skip its bytes — the estimate only
                # sizes blocks, and the partition-count fallback below covers
                # the all-unreadable case
                pass
        if total > 0:
            n_blocks = max(1, math.ceil(total / bytes_per_block))
        else:  # non-file source (e.g. in-memory test frames): partition-based
            n_blocks = max(1, src.rdd.getNumPartitions())
    packed = (
        src.withColumn("blk", F.pmod(F.hash("id"), F.lit(n_blocks)).cast("int"))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("id", "v")).alias("rows"))
    )
    pairs = (
        packed.alias("a")
        .join(packed.alias("b"), F.col("a.blk") <= F.col("b.blk"))
        .select(
            (F.col("a.blk") == F.col("b.blk")).alias("same"),
            F.col("a.rows").alias("rows_a"),
            F.col("b.rows").alias("rows_b"),
        )
    )
    return pairs.mapInPandas(
        _make_block_scorer(m, float(threshold)), "id_a long, id_b long, score double"
    )


def _make_block_scorer(m: str, thr: float):
    """mapInPandas kernel over (same, rows_a, rows_b) block pairs — shared by
    the flat-blocked and the LSH-bucketed near-dup paths. Dot products
    accumulate dimension-by-dimension, the exact IEEE fold order of
    functions/vector.py and the SQL oracle."""

    def score_blocks(batches):
        import numpy as np
        import pandas as pd

        def unpack(rows):
            ids = np.fromiter((r["id"] for r in rows), dtype=np.int64, count=len(rows))
            mat = np.array([r["v"] for r in rows], dtype=np.float64)
            return ids, mat

        def unit(mat):
            sq = np.zeros(len(mat))
            for i in range(mat.shape[1]):  # exact fold order
                sq = sq + mat[:, i] * mat[:, i]
            sq[sq == 0.0] = 1.0  # zero vector stays zero (scores 0.0), no 0/0
            return mat / np.sqrt(sq)[:, None]

        for pdf in batches:
            out_a, out_b, out_s = [], [], []
            for same, ra, rb in zip(pdf["same"], pdf["rows_a"], pdf["rows_b"]):
                ids_a, A = unpack(ra)
                ids_b, B = (ids_a, A) if same else unpack(rb)
                if m == "cosine":
                    A = unit(A)
                    B = A if same else unit(B)
                acc = np.zeros((len(A), len(B)))
                for i in range(A.shape[1]):  # exact fold order, no BLAS reorder
                    if m == "euclidean":
                        d = np.subtract.outer(A[:, i], B[:, i])
                        acc = acc + d * d
                    else:
                        acc = acc + np.multiply.outer(A[:, i], B[:, i])
                score = 1.0 / (1.0 + np.sqrt(acc)) if m == "euclidean" else acc
                lo = ids_a[:, None] < ids_b[None, :] if same else np.ones_like(score, bool)
                ii, jj = np.nonzero((score >= thr) & lo)
                pa, pb, ps = ids_a[ii], ids_b[jj], score[ii, jj]
                flip = pa > pb  # cross-block pairs arrive in arbitrary id order
                pa[flip], pb[flip] = pb[flip], pa[flip]
                out_a.append(pa)
                out_b.append(pb)
                out_s.append(ps)
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a) if out_a else np.array([], np.int64),
                    "id_b": np.concatenate(out_b) if out_b else np.array([], np.int64),
                    "score": np.concatenate(out_s) if out_s else np.array([], np.float64),
                }
            )

    return score_blocks


def _make_block_cc_scorer(m: str, thr: float):
    """Connectivity-preserving variant of :func:`_make_block_scorer` for
    consumers that feed the pairs ONLY into connected components
    (semantic_dedup): instead of emitting every matching pair, compute the
    batch-LOCAL components of the match graph (vectorized min-label
    propagation with pointer jumping over the GEMM score matrix) and emit
    one STAR per component (min-id -> member). Emission per batch drops
    from O(rows^2) to O(rows) — a 10k-copy duplicate clique emits ~20k
    edges instead of ~50M (HOTCLUSTER_WAVE2.json) — while global CC labels
    are BIT-IDENTICAL: every dropped edge (i, j) lies inside one batch, and
    that batch's star connects i and j through its component's min id, so
    the union over batches has exactly the same connected components.
    Scoring (fold order, unit-normalize, threshold) is byte-for-byte the
    shared kernel's."""

    def cc_blocks(batches):
        import numpy as np
        import pandas as pd

        def unpack(rows):
            ids = np.fromiter((r["id"] for r in rows), dtype=np.int64, count=len(rows))
            mat = np.array([r["v"] for r in rows], dtype=np.float64)
            return ids, mat

        def unit(mat):
            sq = np.zeros(len(mat))
            for i in range(mat.shape[1]):  # exact fold order
                sq = sq + mat[:, i] * mat[:, i]
            sq[sq == 0.0] = 1.0
            return mat / np.sqrt(sq)[:, None]

        def stars(ids, M):
            """Star edges per local component of the symmetric bool matrix
            ``M`` over node array ``ids`` (self-matches must be False)."""
            n = len(ids)
            lab = np.arange(n)
            big = n  # sentinel larger than any label
            while True:
                nb = np.where(M, lab[None, :], big).min(axis=1)
                new = np.minimum(lab, nb)
                new = new[new]  # pointer jumping: O(log n) convergence
                if np.array_equal(new, lab):
                    break
                lab = new
            # per-component min GLOBAL id as the hub
            order = np.lexsort((ids, lab))
            lab_sorted = lab[order]
            first = np.ones(n, bool)
            first[1:] = lab_sorted[1:] != lab_sorted[:-1]
            hub_of = np.zeros(n, dtype=np.int64)
            hub_of[lab_sorted] = ids[order][np.maximum.accumulate(
                np.where(first, np.arange(n), 0))]
            matched = M.any(axis=1)
            src = hub_of[lab]
            keep = matched & (ids != src)
            pa, pb = src[keep], ids[keep]
            flip = pa > pb
            pa2 = np.where(flip, pb, pa)
            pb2 = np.where(flip, pa, pb)
            return pa2, pb2

        for pdf in batches:
            out_a, out_b = [], []
            for same, ra, rb in zip(pdf["same"], pdf["rows_a"], pdf["rows_b"]):
                ids_a, A = unpack(ra)
                if same:
                    if m == "cosine":
                        A = unit(A)
                    acc = np.zeros((len(A), len(A)))
                    for i in range(A.shape[1]):
                        if m == "euclidean":
                            d = np.subtract.outer(A[:, i], A[:, i])
                            acc = acc + d * d
                        else:
                            acc = acc + np.multiply.outer(A[:, i], A[:, i])
                    score = (
                        1.0 / (1.0 + np.sqrt(acc)) if m == "euclidean" else acc
                    )
                    M = score >= thr
                    np.fill_diagonal(M, False)
                    pa, pb = stars(ids_a, M)
                else:
                    ids_b, B = unpack(rb)
                    if m == "cosine":
                        A2, B2 = unit(A), unit(B)
                    else:
                        A2, B2 = A, B
                    acc = np.zeros((len(A2), len(B2)))
                    for i in range(A2.shape[1]):
                        if m == "euclidean":
                            d = np.subtract.outer(A2[:, i], B2[:, i])
                            acc = acc + d * d
                        else:
                            acc = acc + np.multiply.outer(A2[:, i], B2[:, i])
                    score = (
                        1.0 / (1.0 + np.sqrt(acc)) if m == "euclidean" else acc
                    )
                    Mb = score >= thr
                    na, nb_ = len(ids_a), len(ids_b)
                    ids = np.concatenate([ids_a, ids_b])
                    M = np.zeros((na + nb_, na + nb_), bool)
                    M[:na, na:] = Mb
                    M[na:, :na] = Mb.T
                    pa, pb = stars(ids, M)
                out_a.append(pa)
                out_b.append(pb)
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a) if out_a else np.array([], np.int64),
                    "id_b": np.concatenate(out_b) if out_b else np.array([], np.int64),
                }
            )

    return cc_blocks


def embedding_near_dup_bucketed(
    df: DataFrame,
    planes: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.45,
    metric: str = "cosine",
    blocks_per_bucket: int = 4,
) -> DataFrame:
    """The 100 TB embedding near-dup path: sign-LSH bucketize (a pure scan
    expression, operators/ann.py:45-53), then run the exact block-GEMM only
    WITHIN each bucket. Global cost drops from O(n²) to Σ_b O(n_b²) — with
    2^n_planes well-mixed buckets that is a ~2^n_planes× pair reduction, and
    the block-pair join becomes an equi-join on the bucket id (one shuffle
    keyed by a small int, never a global cross join).

    APPROXIMATE by construction: a pair is compared only if both rows land in
    the same bucket. For cosine near-dups this is exactly the sign-LSH
    collision guarantee — P(same bucket) = (1 - θ/π)^n_planes, so at
    threshold 0.45 (θ≈63°) with 4 planes expected recall ≈ 0.65²·… ≈ 0.41 per
    single table; raise recall by unioning several plane sets (each pass is
    independent) or lowering n_planes. Scores of emitted pairs are BIT-EXACT
    equal to :func:`embedding_near_dup` — same kernel, same fold order — so
    the output is a strict subset of the exact result (verified in
    tests/test_dedup.py parity test).

    ≙ the role hnswlib plays in the reference (ann.py:21-102) re-expressed as
    batch DataFrame ops per BASELINE.json."""
    from . import ann as A

    m = metric.lower()
    if m not in V.SUPPORTED_METRICS:
        raise ValueError(f"Unknown metric: {metric!r}. Supported: {V.SUPPORTED_METRICS}")
    src = df.select(
        F.col(id_col).alias("id"),
        V.as_double(vector_col).alias("v"),
        A.bucket_expr(vector_col, planes).alias("bkt"),
    )
    packed = (
        src.withColumn(
            "blk", F.pmod(F.hash("id"), F.lit(blocks_per_bucket)).cast("int")
        )
        .groupBy("bkt", "blk")
        .agg(F.collect_list(F.struct("id", "v")).alias("rows"))
    )
    pairs = (
        packed.alias("a")
        .join(
            packed.alias("b"),
            (F.col("a.bkt") == F.col("b.bkt")) & (F.col("a.blk") <= F.col("b.blk")),
        )
        .select(
            (F.col("a.blk") == F.col("b.blk")).alias("same"),
            F.col("a.rows").alias("rows_a"),
            F.col("b.rows").alias("rows_b"),
        )
    )
    return pairs.mapInPandas(
        _make_block_scorer(m, float(threshold)), "id_a long, id_b long, score double"
    )


def semantic_dedup_params(
    df: DataFrame,
    vector_col: str = "embedding",
    dim: int = 64,
    cell_target: int = 4096,
    max_cells: int = 256,
) -> dict:
    """Byte-derived SemDeDup sizing — no count job. ``n_cells`` scales with
    the corpus so cells hold ~``cell_target`` rows (the paper's own setup:
    cluster count grows with corpus — 50k clusters for LAION), clamped to
    ``max_cells`` because :func:`semantic_dedup` inlines centroids as scan
    expressions (the documented centroid-literal seam: beyond a few hundred
    cells route the assignment through IVFIndex's partitioned layout
    instead). ``blocks_per_cell=None`` selects the population-derived
    salting, so a hot cell re-chunks to ~``row_cap`` rows per aggregated
    block regardless of how the k-means assignment skews."""
    from .ann import estimate_corpus_rows

    n_est = estimate_corpus_rows(df, dim=dim)
    if n_est is None:
        n_est = df.count()
    import math

    return {
        "n_cells": min(int(max_cells), max(2, math.ceil(n_est / cell_target))),
        "blocks_per_cell": None,
        "row_cap": int(cell_target),
    }


def semantic_dedup(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    eps: float = 0.45,
    blocks_per_cell: int | None = None,
    row_cap: int = 4096,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-then-dedup.
    Assign every row to its nearest centroid (a pure scan expression — the
    corpus never shuffles for the assignment), find cosine>=eps pairs ONLY
    within each cluster via the exact block-GEMM kernel, resolve duplicate
    groups with connected components, and within each group KEEP the member
    farthest from its cluster centroid (the paper's keep-rule: low-centroid-
    similarity members preserve diversity; everything near the centroid is
    semantic boilerplate). Ties break by lowest id.

    Returns one row per input row:
    ``(id_col, centroid_id int, cluster_id, keep boolean)`` — ``cluster_id``
    is the min-id of the duplicate group (own id when unduplicated), ``keep``
    marks the group survivor.

    Scale shape (100 TB): assignment is scan-side argmin over the centroid
    literals (the IVF contract — centroids are O(cells) by definition); the
    candidate pairs are Sigma_c O((n_c/blocks)^2) block GEMMs keyed on the
    cluster id — with k-means cells kept at ~10k rows (scale n_cells with
    the corpus, exactly the SemDeDup paper's setup: 50k clusters for LAION)
    the pair volume per cell is bounded; components run on the small pair
    list, never the corpus; the keep-rule window partitions by cluster_id
    (bounded by the largest duplicate group, contraction-guarded upstream).
    No global-order window, no driver loop, no collect. Defaults self-scale
    (round 7): ``blocks_per_cell=None`` derives the per-cell salt from the
    CELL's population (ann._salted_pack), so a hot cell's aggregated blocks
    stay ~``row_cap`` rows — results are blocking-invariant; and
    :func:`semantic_dedup_params` sizes ``n_cells`` from corpus file bytes.

    Centroid-count seam — CLOSED (round 7): the default scan-side
    argmin/when-chain inlines every centroid as an expression literal,
    which is the right trade to a few HUNDRED cells (one projection,
    zero shuffle); at the paper's 50k clusters pass ``assigned`` =
    :func:`ann.ivf_assign_join`'s output with ``with_cosine=True``
    (broadcast-join argmin, bit-identical assignment semantics, one
    Exchange keyed on the id) and the ``centroids``/literal path is
    skipped entirely — the pair-mining/CC/keep stages are unchanged
    (tested identical labels both ways).

    The reference's nearest analog is its duplicate-tolerant store
    (``add_vectors`` never dedups — src/vectordb/store.py); this is the
    batch curation move its corpus would need before HNSW indexing
    (duplicate embeddings are the measured flat-graph recall pathology,
    GRAPH_SERVING_SF10_CLONES.json)."""
    if assigned is not None:
        # Materialize once: the assignment behind this frame is typically
        # the rows×K broadcast-NLJ argmin (ivf_assign_join) — without a
        # checkpoint the count-guard below plus the two downstream
        # consumers (packing, label join) would re-execute it three times.
        assigned = assigned.select(
            F.col(id_col).alias("id"), F.col("v"), "centroid_id", "sim_c"
        ).localCheckpoint(eager=False)  # count-guard below materializes
        # ivf_assign_join aggregates on the id, so duplicate ids in ``df``
        # would be silently collapsed upstream — enforce the documented
        # unique-id contract with a count-preservation check (cheap against
        # the checkpointed frame; the literal path preserves duplicates and
        # needs no check).
        n_in, n_as = df.count(), assigned.count()
        if n_in != n_as:
            raise ValueError(
                f"semantic_dedup: assigned frame has {n_as} rows but the "
                f"corpus has {n_in} — duplicate ids were collapsed by the "
                "join-assignment (ivf_assign_join requires unique ids)"
            )
    else:
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        V.euclidean_distance(
                            F.col("v"), V.vector_literal(list(c))
                        ).alias("d"),
                        F.lit(i).cast("int").alias("cid"),
                    )
                    for i, c in enumerate(centroids)
                ]
            )
        )["cid"]
        # cosine(row, OWN centroid): chained whens over the same centroid
        # literals — still one scan-side expression, evaluated once per row.
        sim_c = F.lit(None).cast("double")
        for i in range(len(centroids) - 1, -1, -1):
            sim_c = F.when(
                F.col("centroid_id") == i,
                V.cosine_similarity(
                    F.col("v"), V.vector_literal(list(centroids[i]))
                ),
            ).otherwise(sim_c)
        assigned = (
            df.select(
                F.col(id_col).alias("id"), V.as_double(vector_col).alias("v")
            )
            .withColumn("centroid_id", best)
            .withColumn("sim_c", sim_c)
        )
    from .ann import _salted_pack

    packed = _salted_pack(
        assigned.select("id", "v", "centroid_id"),
        ["centroid_id"],
        blocks_per_cell,
        row_cap,
    )
    pairs = (
        packed.alias("a")
        .join(
            packed.alias("b"),
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.blk") <= F.col("b.blk")),
        )
        .select(
            (F.col("a.blk") == F.col("b.blk")).alias("same"),
            F.col("a.rows").alias("rows_a"),
            F.col("b.rows").alias("rows_b"),
        )
        # pairs feed ONLY connected components here, so the kernel emits a
        # spanning STAR per batch-local component instead of every matching
        # pair — O(rows) emission at any clique size, bit-identical labels
        # (see _make_block_cc_scorer; rehearsed in HOTCLUSTER_WAVE2.json)
        .mapInPandas(
            _make_block_cc_scorer("cosine", float(eps)),
            "id_a long, id_b long",
        )
    )
    comp = connected_components(pairs)
    labeled = (
        assigned.join(comp, on="id", how="left")
        .select(
            "id",
            "centroid_id",
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
            "sim_c",
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("sim_c").asc(), F.col("id").asc()
    )
    return labeled.select(
        F.col("id").alias(id_col),
        "centroid_id",
        "cluster_id",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def _span_islands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    max_posting: int,
) -> DataFrame:
    """Shared core of the span-dedup family: diagonal match islands.

    Returns one row per maximal run of consecutive shingle matches —
    ``(id_a, id_b, d, isl, span_tokens, jb_start)`` where ``span_tokens``
    is the verbatim-run length in TOKENS (run + k - 1) and ``jb_start``
    the run's first token position in the LATER document (id_b; pairs are
    emitted with id_a < id_b so masking consumers always keep the earlier
    copy)."""
    toks = F.split(T.normalized_text(text_col), " ")
    shingles = F.when(
        F.size("w") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - k),
            lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = (
        df.select(F.col(id_col).alias("id"), toks.alias("w"))
        .select("id", F.posexplode(shingles).alias("pos", "shingle"))
        .select(
            "id",
            "pos",
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
            .cast("long")
            .alias("sig"),
        )
    )
    # Posting cap with the minhash discipline (keep the ``max_posting``
    # LOWEST-id docs per shingle, ALL their positions) instead of dropping
    # the whole over-cap bucket: a 10k-copy duplicate flood (ids always
    # append-monotone, so floods arrive HIGH) then cannot evict the
    # earlier copies' postings — base-corpus pairs and masks are
    # bit-invariant to the flood (rehearsed in HOTCLUSTER_WAVE2.json).
    # dense_rank ranks DISTINCT ids, so a kept doc keeps every position.
    w_sig = Window.partitionBy("sig").orderBy("id")
    capped = (
        sh.withColumn("_dr", F.dense_rank().over(w_sig))
        .filter(F.col("_dr") <= max_posting)
        .drop("_dr")
    )
    m = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.pos").alias("ia"),
            F.col("b.pos").alias("jb"),
        )
        .withColumn("d", F.col("ia") - F.col("jb"))
    )
    w_diag = Window.partitionBy("id_a", "id_b", "d").orderBy("ia")
    return (
        m.withColumn("isl", F.col("ia") - F.row_number().over(w_diag))
        .groupBy("id_a", "id_b", "d", "isl")
        .agg(
            (F.count("*") + F.lit(k - 1)).alias("span_tokens"),
            F.min("jb").alias("jb_start"),
        )
    )


def shared_span_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_tokens: int = 8,
    min_span_tokens: int = 24,
    max_posting: int = 50,
) -> DataFrame:
    """Span-level (exact-substring) dedup — the Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) granularity, re-expressed relationally: find document
    pairs that share a VERBATIM run of >= ``min_span_tokens`` whitespace
    tokens, without suffix arrays. Doc-level Jaccard (minhash/ngram above)
    misses a 30-token boilerplate block inside two otherwise-different
    documents; this catches exactly that.

    Method (diagonal run detection):
    1. positional K-token shingles per doc (one Generate over the token
       array — (id, pos, shingle));
    2. posting-capped equi-join on the shingle's md5 fingerprint — a
       shared span of L tokens yields L-K+1 matches on the SAME diagonal
       ``d = pos_a - pos_b``;
    3. gaps-and-islands per (pair, diagonal): ``island = ia - row_number``
       over the diagonal ordered by ia, so consecutive matches collapse to
       one island of span ``run + K - 1`` tokens.

    Returns ``(id_a, id_b, longest_span, n_spans)`` for pairs whose longest
    shared run >= ``min_span_tokens`` (``n_spans`` counts qualifying
    islands).

    Scale shape (100 TB): shingling is a scan-side Generate; the ONLY join
    is an equi-join on an 8-byte fingerprint with the same ``max_posting``
    discipline as minhash — an over-cap shingle keeps its ``max_posting``
    LOWEST-id docs (all positions), so a duplicate flood (append-monotone
    ids arrive high) cannot evict earlier copies' postings: base-corpus
    pairs are bit-invariant to the flood (HOTCLUSTER_WAVE2.json) and
    recall degrades only on the flood itself, never as false positives or
    span splits in the kept docs; the islands window partitions
    by (pair, diagonal) — bounded by document length, never corpus-sized;
    the final aggregate is keyed on the pair ids. No cross join, no global
    window, no driver loop."""
    islands = _span_islands(
        df, id_col, text_col, int(shingle_tokens), int(max_posting)
    )
    return (
        islands.groupBy("id_a", "id_b")
        .agg(
            F.max("span_tokens").alias("longest_span"),
            F.sum(
                (F.col("span_tokens") >= int(min_span_tokens)).cast("long")
            ).alias("n_spans"),
        )
        .filter(F.col("longest_span") >= int(min_span_tokens))
    )


def span_mask_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_tokens: int = 8,
    min_span_tokens: int = 24,
    max_posting: int = 50,
) -> DataFrame:
    """The REMOVAL half of span-level dedup (Lee et al. 2022 delete the
    duplicated substring, not the document): for every doc, how many of its
    tokens sit inside a verbatim run of >= ``min_span_tokens`` tokens that
    also appears in an EARLIER doc (lower id — the kept copy). Masked
    positions are the interval UNION over all qualifying spans (a token
    covered by two overlapping spans counts once).

    Returns one row per input doc:
    ``(id_col, n_tokens, n_masked, masked_ppm)`` — ``masked_ppm`` is the
    integer floor of the masked fraction in parts-per-million (exact
    integer division, engine-reproducible).

    Scale shape: islands come from the shared posting-capped span core
    (one fingerprint equi-join + per-(pair,diagonal) windows); the
    interval union is an explode of covered positions (bounded by corpus
    token count, 16 B/row) + a distinct keyed on (doc, pos); everything
    else is per-doc aggregation. No cross join, no global window."""
    k = int(shingle_tokens)
    islands = _span_islands(df, id_col, text_col, k, int(max_posting)).filter(
        F.col("span_tokens") >= int(min_span_tokens)
    )
    covered = (
        islands.select(
            F.col("id_b").alias("id"),
            F.explode(
                F.sequence(
                    F.col("jb_start"),
                    F.col("jb_start") + F.col("span_tokens") - 1,
                )
            ).alias("pos"),
        )
        .distinct()
        .groupBy("id")
        .agg(F.count("*").alias("n_masked"))
    )
    toks = F.split(T.normalized_text(text_col), " ")
    base = df.select(
        F.col(id_col).alias("id"), F.size(toks).cast("long").alias("n_tokens")
    )
    return (
        base.join(covered, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("n_masked"), F.lit(0)).cast("long").alias("n_masked"),
        )
        .withColumn(
            "masked_ppm",
            F.expr("(n_masked * 1000000) DIV n_tokens").cast("long"),
        )
    )
