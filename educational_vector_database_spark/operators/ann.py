"""Approximate nearest-neighbor search — the batch scale path.

The reference serves ANN online via an HNSW graph (reference src/vectordb/
ann.py:21-102); BASELINE.json fixes our approach as "batch vector index build
via DataFrame ops, no online ANN serving". Three strategies, cheapest first:

1. ``bucket_expr`` / ``knn_in_bucket`` — random-hyperplane sign LSH with FIXED
   deterministic hyperplanes (seeded, generated once driver-side, inlined as
   literals). Bucket assignment is a pure Column expression -> at 100 TB the
   bucket id computes during the scan, can be a partition column of the stored
   index (partition pruning turns a query into a one-bucket scan), and is
   bit-reproducible anywhere — which also makes it oracle-checkable.
2. ``ivf_assign`` — IVF: nearest-centroid assignment against a broadcast
   centroid table (centroids from KMeans or any external source); probe the
   ``nprobe`` nearest centroids at query time.
3. ``brp_lsh_join`` — MLlib ``BucketedRandomProjectionLSH`` wrapper for
   approximate similarity self-joins (euclidean).

Exact kNN (operators/knn.py) stays the canonical semantics, mirroring the
reference's own parity test which trusts brute force (tests/
test_v3_features.py:29-46).
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector as V
from . import knn as K

LSH_SEED = 42


def corpus_fingerprint(
    df: DataFrame, id_col: str = "vec_id", vector_col: str = "embedding"
) -> int:
    """Order-independent (id, vector) digest: bit_xor of per-row xxhash64.
    xor commutes and cannot overflow under ANSI mode; ids are unique so
    cancellation needs a full 64-bit hash collision. One aggregate job.
    Composable: fp(A ∪ B) == fp(A) ^ fp(B) for disjoint A, B — which lets
    an index update its stored fingerprint after a pure-append fold-in
    without re-scanning the kept corpus."""
    row = df.select(
        F.xxhash64(F.col(id_col), F.col(vector_col)).alias("_h")
    ).agg(F.expr("bit_xor(_h)").alias("h")).collect()[0]
    return int(row.h) if row.h is not None else 0


def estimate_corpus_rows(
    df: DataFrame, dim: int = 64, footer_sample: int = 8
) -> int | None:
    """Driver-side row-count ESTIMATE from parquet file bytes — no count()
    job, no scan. bytes/row is CALIBRATED from up to ``footer_sample``
    parquet footers (footer-only metadata reads — ``num_rows`` is exact in
    the footer, no data pages touched), so the estimate is exact when the
    sample covers every file and within the sample's size-spread otherwise;
    the round-7 constant (6 bytes/element, which ran 33% hot at dim=384 —
    DIM384_REHEARSAL.json rows_ratio 0.669) survives only as the fallback
    for non-parquet sources. Paths are URI-decoded (``df.inputFiles()``
    returns percent-escaped ``file:`` URIs), and any file that cannot be
    sized makes the whole estimate return None — a partially-counted corpus
    must fall back to count(), not under-provision planes. Returns None for
    non-file/remote sources; callers then fall back to a partition-count or
    explicit-argument path."""
    from urllib.parse import unquote, urlparse

    files = []
    for p in df.inputFiles():
        u = urlparse(p)
        if u.scheme not in ("", "file"):
            return None  # remote source: sizes unknowable driver-side
        files.append(unquote(u.path))
    if not files:
        return None
    sizes = {}
    total = 0
    for p in files:
        try:
            sz = os.path.getsize(p)
        except OSError:
            return None  # unsizable file -> caller falls back to count()
        sizes[p] = sz
        total += sz
    if total == 0:
        return None  # empty/zero-byte source: unknown, not a 1-row corpus
    bpr = None
    try:
        import pyarrow.parquet as pq

        s_rows = 0
        s_bytes = 0
        for p in sorted(files)[: max(1, int(footer_sample))]:
            s_rows += pq.ParquetFile(p).metadata.num_rows
            s_bytes += sizes[p]
        if s_rows > 0:
            bpr = s_bytes / s_rows
    except Exception:
        bpr = None  # non-parquet: dim heuristic below
    if bpr is None or bpr <= 0:
        bpr = float(max(64, 6 * int(dim)))
    return max(1, int(total / bpr))


def _salted_pack(
    keyed: DataFrame,
    group_cols: Sequence[str],
    blocks: int | None,
    row_cap: int,
) -> DataFrame:
    """Pack ``(id, v)`` rows into per-group blocks of BOUNDED size.

    The block-GEMM kernels aggregate each (group, blk) into ONE
    ``collect_list`` row; with a fixed block count a hot group (skewed LSH
    bucket, hot k-means cell) packs ~group_pop/blocks vectors into a single
    aggregated row — an executor-memory scale-killer at 100× data. Fix is
    minhash's ``max_posting`` discipline applied to blocking: when
    ``blocks`` is None, count each group's population first (one partial-agg
    shuffle of the tiny group-key tuples), broadcast the counts back, and
    salt with ``ceil(n/row_cap)`` blocks PER GROUP — expected rows per
    aggregated block ≤ row_cap at ANY group population. The id-hash salt is
    uniform, so actual block sizes concentrate tightly around the cap
    (binomial; stddev ~ sqrt(row_cap)) — asserted on a deliberately hot
    bucket in tests/test_graph.py. Results of every consumer are invariant
    to the blocking (each pair is scored exactly once either way), so the
    derived path changes cost shape only, never answers."""
    gcols = [F.col(c) for c in group_cols]
    if blocks is not None:
        nblk = F.lit(int(blocks))
    else:
        counts = keyed.groupBy(*group_cols).agg(F.count("*").alias("_grp_n"))
        keyed = keyed.join(F.broadcast(counts), list(group_cols))
        nblk = F.greatest(
            F.lit(1), F.ceil(F.col("_grp_n") / F.lit(int(row_cap)))
        ).cast("int")
    return (
        keyed.withColumn("blk", F.pmod(F.hash("id"), nblk).cast("int"))
        .groupBy(*gcols, F.col("blk"))
        .agg(F.collect_list(F.struct("id", "v")).alias("rows"))
    )


def _block_pairs(packed: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Self-join packed blocks within each group: every unordered block
    pair once (``a.blk <= b.blk``) — the shared candidate-pair generator
    of the graph builders."""
    cond = F.col("a.blk") <= F.col("b.blk")
    for c in group_cols:
        cond = (F.col(f"a.{c}") == F.col(f"b.{c}")) & cond
    return (
        packed.alias("a")
        .join(packed.alias("b"), cond)
        .select(
            (F.col("a.blk") == F.col("b.blk")).alias("same"),
            F.col("a.rows").alias("rows_a"),
            F.col("b.rows").alias("rows_b"),
        )
    )


def _waved_edge_build(
    keyed: DataFrame,
    group_cols: Sequence[str],
    m_metric: str,
    m: int,
    n_waves: int,
    work_dir: str,
    blocks_per_bucket: int | None,
    row_cap: int,
    score_tier: str = "exact",
    merge_buckets: int | None = None,
) -> DataFrame:
    """Bounded-SPILL graph build (VERDICT r9 #4 — the measured 20M wall):
    the one-shot builders shuffle several corpus-equivalents at once (R
    plane-set packs + the kernel's candidate stream), and shuffle files of
    an IN-FLIGHT job cannot be reclaimed — at 20M×64 that spilled ~63 GB
    against a ~94 GB disk. Pairs only form WITHIN a bucket group, so the
    bucket key partitions the build losslessly: hash the group key into
    ``n_waves`` waves, run pack → block-pair join → GEMM kernel →
    per-node top-m as a SEPARATE job per wave, checkpoint each wave's
    edge delta to parquet, and let the cleaner reclaim the completed
    wave's shuffle before the next starts — in-flight shuffle is
    O(corpus / n_waves), not O(R × corpus).

    Identical results to the one-shot build: per-node top-m within each
    wave is a lossless contraction (any globally-top-m edge is top-m in
    its own wave), scores are bit-identical (same kernel, same fold), and
    the final merge reuses the same dedup-by-max + window tail.

    ``work_dir`` holds the keyed spill (deleted after the waves) and the
    per-wave edge deltas (the returned DataFrame READS them — the caller
    owns the directory's lifetime; persist+count the result before
    removing it).

    Resume is FINGERPRINT-GUARDED: a ``_build_fingerprint.json`` marker in
    ``work_dir`` records the build params and a content hash of the keyed
    corpus; completed waves (``_SUCCESS``-stamped deltas) are reused only
    when the marker matches, otherwise every stale delta is wiped first.
    Without the guard, a rebuild into the same ``work_dir`` after the data
    or any pair-shaping knob changed would silently serve the OLD graph.

    ``merge_buckets``: the final merge is itself one Exchange over EVERY
    wave's delta (Σ ≈ corpus × plane-sets × m / dedup rows) — measured at
    the 10M rung it was the run's disk high-water (93 GB of 94) AFTER the
    waves stayed bounded. With ``merge_buckets=P`` each wave's delta is
    written partitioned by ``pmod(hash(src), P)``, and the merge runs as P
    partition-pruned jobs (each reads 1/P of the deltas, tops-m, and
    checkpoints before the next allocates) — in-flight merge shuffle
    O(total/P), same discipline as the waves, same ``_SUCCESS`` resume.
    Lossless for the same reason blocking is: every row of a given ``src``
    lands in exactly one bucket, so per-src top-m is computed over exactly
    the rows the one-shot merge sees.

    Shuffle reclamation between waves is BEST-EFFORT: the wave boundary
    ends the job (so the ContextCleaner may release its shuffle files),
    but release timing is the JVM GC's — callers running multi-wave scale
    builds should set ``spark.cleaner.periodicGC.interval`` low (e.g.
    ``90s``, as ``tools/two_level_ab.py`` does) so a large idle driver
    heap doesn't pin completed waves' spill."""
    import json as _json
    import shutil

    spark = keyed.sparkSession
    keyed_dir = os.path.join(work_dir, "keyed")
    edges_dir = os.path.join(work_dir, "edges")
    n_waves = max(1, int(n_waves))
    (
        keyed.withColumn(
            "wave",
            F.pmod(F.hash(*[F.col(c) for c in group_cols]),
                   F.lit(n_waves)).cast("int"),
        )
        .write.mode("overwrite").partitionBy("wave").parquet(keyed_dir)
    )
    # Content fingerprint off the spilled keyed table (one columnar scan —
    # cheap next to any wave): order-independent sum of bounded row hashes,
    # plus the exact row count. pmod keeps the sum far from long overflow
    # (ANSI mode makes a wrapped sum an ERROR, not a quiet hash).
    kd = spark.read.parquet(keyed_dir)
    h = kd.agg(
        F.sum(F.pmod(F.xxhash64(*[F.col(c) for c in kd.columns]),
                     F.lit(1_000_000_007))).alias("h"),
        F.count("*").alias("n"),
    ).collect()[0]
    mb = int(merge_buckets) if merge_buckets else 0
    final_dir = os.path.join(work_dir, "final")
    fp = {
        "group_cols": list(group_cols), "metric": m_metric, "m": int(m),
        "n_waves": n_waves, "blocks_per_bucket": blocks_per_bucket,
        "row_cap": int(row_cap), "score_tier": score_tier,
        "merge_buckets": mb,
        "data_hash": int(h.h or 0), "rows": int(h.n),
    }
    marker = os.path.join(work_dir, "_build_fingerprint.json")
    prev = None
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                prev = _json.load(f)
        except (OSError, ValueError):
            prev = None
    if prev != fp:
        shutil.rmtree(edges_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.makedirs(work_dir, exist_ok=True)
        with open(marker, "w") as f:
            _json.dump(fp, f)
    kernel = _make_block_topm_kernel(m_metric, m, score_tier)
    # A wave's pairs frame is SMALL in bytes (a few thousand aggregated
    # block rows) but huge in compute (each pair is up to a row_cap^2 GEMM)
    # — AQE coalesces it to a handful of partitions and strands the kernel
    # on 4 of 32 cores (measured: 84% idle at the 5M rung). Pin the kernel
    # fan-out to the executor parallelism; round-robin over coarse
    # uniform-cost rows is the right balance and the extra shuffle moves
    # only the wave's packed payload.
    par = spark.sparkContext.defaultParallelism
    for w in range(n_waves):
        out_w = os.path.join(edges_dir, f"wave={w}")
        if os.path.exists(os.path.join(out_w, "_SUCCESS")):
            continue  # wave-level resume: deltas are deterministic
        wk = (
            spark.read.parquet(keyed_dir)
            .filter(F.col("wave") == w).drop("wave")
        )
        packed = _salted_pack(wk, group_cols, blocks_per_bucket, row_cap)
        cand = _block_pairs(packed, group_cols).repartition(par).mapInPandas(
            kernel, "src long, dst long, score double"
        )
        delta = _topm_edges(cand, m)
        if mb > 1:
            (
                delta.withColumn(
                    "sbkt", F.pmod(F.hash("src"), F.lit(mb)).cast("int")
                )
                .write.mode("overwrite").partitionBy("sbkt").parquet(out_w)
            )
        else:
            delta.write.mode("overwrite").parquet(out_w)
        # the wave boundary ends the job so the ContextCleaner CAN reclaim
        # its shuffle files before the next wave allocates; actual release
        # timing belongs to the JVM GC — see the docstring's
        # spark.cleaner.periodicGC.interval note. Deliberately NO
        # spark.catalog.clearCache() here: shuffle files are not cached
        # relations, so it never helped the bound — but it unpersists
        # EVERY cached frame in the caller's session (measured at the 10M
        # A/B: the serve leg re-deriving its wiped upper graph per hop
        # read 622 s vs 74 s warm — TWO_LEVEL_PROFILE_10M.json).
    shutil.rmtree(keyed_dir, ignore_errors=True)
    if mb > 1:
        # bucketed merge: P partition-pruned top-m jobs, each bounded to
        # 1/P of the deltas and checkpointed — the waves' spill discipline
        # applied to the merge itself (see docstring)
        if "sbkt" not in spark.read.parquet(edges_dir).columns:
            # deltas written without partitionBy(sbkt) can only exist if
            # the fingerprint marker was edited by hand (the fp includes
            # merge_buckets) — refuse loudly rather than scan-per-bucket
            raise ValueError(
                f"wave deltas under {edges_dir} lack the sbkt partition "
                f"column required by merge_buckets={mb}; the work_dir is "
                f"stale — delete it and rebuild"
            )
        for b in range(mb):
            out_b = os.path.join(final_dir, f"sbkt={b}")
            if os.path.exists(os.path.join(out_b, "_SUCCESS")):
                continue  # bucket-level resume: buckets are deterministic
            part = (
                spark.read.parquet(edges_dir)
                .filter(F.col("sbkt") == b)
                .select("src", "dst", "score")
            )
            # no clearCache here either — see the wave-loop note: it
            # frees no shuffle files and wipes the caller's caches
            _topm_edges(part, m).write.mode("overwrite").parquet(out_b)
        return (
            spark.read.parquet(final_dir).select("src", "dst", "score")
        )
    merged = spark.read.parquet(edges_dir).select("src", "dst", "score")
    return _topm_edges(merged, m)


def hyperplanes(dim: int, n_planes: int = 4, seed: int = LSH_SEED) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (fixed seed -> identical on every
    driver, executor, and oracle engine)."""
    rng = np.random.RandomState(seed)
    return [[float(x) for x in rng.randn(dim)] for _ in range(n_planes)]


def bucket_expr(vector_col: Column | str, planes: Sequence[Sequence[float]]) -> Column:
    """Sign-LSH bucket id: bit j = (v . h_j) > 0; bucket = Σ bit << j.
    Pure fold arithmetic — no UDF, no RNG at execution time."""
    v = V.as_double(vector_col)
    bits = [
        F.when(V.dot_product(v, V.vector_literal(h)) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j, h in enumerate(planes)
    ]
    return sum(bits).cast("int")


def bucket_of(query_vector: Sequence[float], planes: Sequence[Sequence[float]]) -> int:
    """Driver-side bucket of a query vector — same left-to-right fold as the
    Column expression so the boundary cases agree bit-for-bit."""
    b = 0
    for j, h in enumerate(planes):
        s = 0.0
        for x, y in zip(query_vector, h):
            s += float(x) * float(y)
        if s > 0:
            b |= 1 << j
    return b


def knn_in_bucket(
    df: DataFrame,
    query_vector: Sequence[float],
    planes: Sequence[Sequence[float]],
    k: int = 5,
    metric: str = "cosine",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe_buckets: int = 1,
) -> DataFrame:
    """Approximate kNN: restrict the exact scan to the query's LSH bucket(s).

    With the index stored partitioned by bucket, the filter becomes partition
    pruning — the physical plan reads 1/2^n_planes of the data. ``n_probe_buckets``
    > 1 probes neighboring buckets (hamming-1 flips) for higher recall."""
    qb = bucket_of(query_vector, planes)
    probe = [qb]
    if n_probe_buckets > 1:
        probe += [qb ^ (1 << j) for j in range(min(n_probe_buckets - 1, len(planes)))]
    pred = bucket_expr(vector_col, planes).isin(probe)
    return K.knn(df.filter(pred), query_vector, k=k, metric=metric,
                 vector_col=vector_col, id_col=id_col)


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vector_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """IVF cell assignment: argmin euclidean distance over the centroid set,
    computed as a PURE scan-side Column expression — the corpus never
    shuffles, never joins, and duplicate input rows are preserved (each row
    gets its own assignment). Adds ``centroid_id`` (write the index
    partitioned by it, and the cell predicate becomes partition pruning).

    Centroids are collected to the driver and inlined as literals: an IVF
    centroid table is O(cells) rows by definition (the index would be useless
    otherwise), the same small-table contract under which Spark broadcasts.
    ``array_min`` over ``struct(dist, centroid_id)`` is Spark's lexicographic
    struct ordering: minimum distance, ties broken by lowest centroid id —
    identical semantics to the oracle's ``row_number`` formulation."""
    cents = sorted(
        (
            (int(r[0]), [float(x) for x in r[1]])
            for r in centroids.select(centroid_id_col, centroid_vec_col).collect()
        ),
        key=lambda t: t[0],
    )
    # one server-side parse (V.argmin_struct_sql) instead of a Python loop
    # of per-centroid Column builders: identical arithmetic and tie-breaks,
    # ~2 py4j calls instead of ~100 x n_cells (guide §1.2 — driver-side
    # construction latency measured as the dominant cost of the
    # expression-heavy rows in round 11)
    v_sql = V.as_double_sql(f"`{vector_col}`")
    best = F.expr(
        V.argmin_struct_sql(
            (
                V.euclidean_distance_sql(v_sql, V.sql_array_double(cv))
                for _, cv in cents
            ),
            (cid for cid, _ in cents),
            c_alias="cid",
        )
    )
    return df.withColumn(centroid_id_col, best)


def ivf_assign_join(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
    with_cosine: bool = False,
) -> DataFrame:
    """IVF cell assignment via a BROADCAST JOIN instead of centroid
    literals — the 50k-cell path :func:`ivf_assign`'s docstring reserves.
    The literal form inlines every centroid into one scan expression:
    ideal to a few hundred cells (zero shuffle, duplicate rows preserved)
    but the generated code stops JIT-compiling in the thousands
    (SemDeDup's paper setup is 50k clusters). Here the centroid table
    ships once per executor as a broadcast, the corpus expands rows×K
    INSIDE the codegen pipeline (BroadcastNestedLoopJoin — never
    materialized: map-side partial aggregation collapses each row's K
    candidates before the one Exchange keyed on ``id_col``), and the
    argmin is ``min(struct(dist, cid))`` — bit-identical semantics to the
    literal path (minimum distance, ties to lowest centroid id; asserted
    in tests). Requires unique ids (the aggregation is keyed on them).

    ``with_cosine=True`` also returns ``sim_c`` = cosine(row, OWN
    centroid) — carried as a third struct field, never consulted by the
    ordering because (dist, cid) is already unique — which is exactly the
    keep-rule input :func:`dedup.semantic_dedup` needs, so SemDeDup can
    run at any cell count by feeding this frame in as ``assigned``.
    Returns ``(id_col, vector_col as v double[], centroid_id[, sim_c])``.

    Guards (the literal path fails loudly on both; this path must too):
    empty ``centroids`` raises instead of silently emitting zero rows, and
    the unique-id requirement is enforced post-hoc in
    :func:`dedup.semantic_dedup`'s assigned-frame row-count check — callers
    passing duplicate ids would silently collapse them here."""
    cent_sel = centroids.select(
        F.col(centroid_id_col).cast("int").alias("_cid"),
        V.as_double(centroid_vec_col).alias("_cv"),
    )
    if cent_sel.isEmpty():  # one tiny job over the (small) centroid frame
        raise ValueError(
            "ivf_assign_join: empty centroid frame — assignment would "
            "silently emit zero rows; train/provide >=1 centroid"
        )
    c = F.broadcast(cent_sel)
    src = df.select(F.col(id_col), V.as_double(vector_col).alias("v"))
    # the row's vector rides INSIDE the min-struct (never consulted by the
    # ordering — (d, cid) is already unique per centroid), so the argmin is
    # ONE aggregate with ONE Exchange keyed on the id: no join-back pass
    fields = [
        V.euclidean_distance(F.col("v"), F.col("_cv")).alias("d"),
        F.col("_cid").alias("cid"),
    ]
    if with_cosine:
        fields.append(
            V.cosine_similarity(F.col("v"), F.col("_cv")).alias("sim")
        )
    fields.append(F.col("v").alias("rv"))
    return (
        src.crossJoin(c)
        .groupBy(id_col)
        .agg(F.min(F.struct(*fields)).alias("_b"))
        .select(
            id_col,
            F.col("_b.rv").alias("v"),
            F.col("_b.cid").alias(centroid_id_col),
            *([F.col("_b.sim").alias("sim_c")] if with_cosine else []),
        )
    )


def ivf_assign_gemm(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
    with_cosine: bool = False,
    batch_rows: int = 4096,
) -> DataFrame:
    """IVF cell assignment as a blocked GEMM — the THROUGHPUT path at
    paper-scale cell counts (SemDeDup runs 50k clusters for LAION; the
    paper does this step as GPU matmul). :func:`ivf_assign_join` is the
    bit-exact scale path (its expression-level distance keeps the literal
    path's IEEE op order, so oracles hash-match), but its rows×K
    BroadcastNestedLoopJoin evaluates K higher-order-function distances
    PER ROW — measured 2,230 s for 20k rows × 5k cells (SEMDEDUP_SCALE
    round 8). Here the centroid matrix (K×dim float64, K·dim·8 bytes —
    2.6 MB at 5k×64, 154 MB at 50k×384, well inside executor memory)
    ships in the Arrow-serialized closure and each input batch computes
    ALL K distances as ONE ``||x||² - 2XCᵀ + ||c||²`` matmul: same
    output schema and the same ties-to-lowest-cid argmin (np.argmin
    returns the first minimum; centroid order IS cid order), but the
    float op ORDER differs from the expression path, so equidistant-
    to-1-ulp argmin ties can in principle differ — parity on the
    continuous fixtures is exact (tested), and the hash-gated rows keep
    using the expression paths. No shuffle at all: the assignment is a
    pure mapInPandas over the scan, output partitioning = input.
    Returns ``(id_col, v array<double>, centroid_id[, sim_c])``."""
    import numpy as np

    cent_rows = centroids.select(
        F.col(centroid_id_col).cast("int").alias("_cid"),
        V.as_double(centroid_vec_col).alias("_cv"),
    ).collect()
    if not cent_rows:
        raise ValueError(
            "ivf_assign_gemm: empty centroid frame — assignment would "
            "silently emit zero rows; train/provide >=1 centroid"
        )
    cent_rows.sort(key=lambda r: r._cid)
    cids = np.array([r._cid for r in cent_rows], dtype=np.int32)
    C = np.array([r._cv for r in cent_rows], dtype=np.float64)
    c_sq = (C * C).sum(axis=1)
    c_norm = np.sqrt(c_sq)
    want_cos = bool(with_cosine)
    bsz = int(batch_rows)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            for lo in range(0, n, bsz):
                chunk = pdf.iloc[lo:lo + bsz]
                X = np.stack(chunk["v"].to_numpy())
                x_sq = (X * X).sum(axis=1)
                dots = X @ C.T
                d2 = x_sq[:, None] - 2.0 * dots + c_sq[None, :]
                best = d2.argmin(axis=1)  # first min -> lowest cid
                out = {
                    "id": chunk["id"].to_numpy(),
                    "v": chunk["v"],
                    "centroid_id": cids[best],
                }
                if want_cos:
                    x_norm = np.sqrt(x_sq)
                    num = dots[np.arange(len(best)), best]
                    den = x_norm * c_norm[best]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        out["sim_c"] = np.where(den > 0, num / den, 0.0)
                yield pd.DataFrame(out)

    src = df.select(
        F.col(id_col).alias("id"), V.as_double(vector_col).alias("v")
    )
    id_sql_type = df.schema[id_col].dataType.simpleString()
    schema = f"id {id_sql_type}, v array<double>, centroid_id int" + (
        ", sim_c double" if want_cos else ""
    )
    out = src.mapInPandas(assign, schema)
    return out.select(
        F.col("id").alias(id_col), "v",
        F.col("centroid_id").alias(centroid_id_col),
        *(["sim_c"] if want_cos else []),
    )


def train_ivf_centroids(
    df: DataFrame, n_cells: int, vector_col: str = "embedding", seed: int = LSH_SEED
) -> DataFrame:
    """KMeans centroids via MLlib (batch index build via DataFrame ops — the
    BASELINE.json approach, ≙ HNSWIndex.build ann.py:67-76). Returns
    ``(centroid_id, centroid array<double>)``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = df.select(array_to_vector(V.as_double(vector_col)).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(feat)
    centers = model.clusterCenters()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "centroid_id: int, centroid: array<double>",
    )


#: Margin over the isotropic null for the clusterability verdict — the
#: measured gap (numpy calibration at S=16k, d=64): isotropic nn1 ≈ 0.47
#: vs null 0.55, Zipf-GMM corpora (200 and 2,000 true clusters, σ=0.5)
#: nn1 ≈ 0.84-0.87. null+0.15 splits the regimes with ≥0.14 slack on
#: both sides, independent of how many clusters the corpus actually has.
NN1_CLUSTERED_MARGIN = 0.15

#: Below this corpus size warm brute wins on latency over every walk
#: (CLONES_PIPELINE_AB.json: brute 13.8s vs two-level 19.4s at 200k;
#: TWO_LEVEL_AB.json base-vs-big legs put the walk crossover near 10^6
#: rows, where the 2M leg measures the descent 6.7x faster than brute).
AUTO_BRUTE_MAX_ROWS = 1_000_000


def corpus_clusterability(
    df: DataFrame,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 16384,
    n_rows: int | None = None,
    seed: int = LSH_SEED,
) -> dict:
    """Cheap clusterability probe behind ``index_type="auto"`` — the
    round-9 lesson (BASELINE.md forensics chain) as a measurement: which
    serving regime a corpus is in is a property of the DATA, so measure it
    before choosing an index. Statistic: ``nn1`` = mean over a bounded
    deterministic hash-sample of each sample row's TOP-1 cosine to any
    other sample row. On isotropic data nn1 tracks the max-of-S-Gaussians
    law sqrt(2 ln S / dim) (the analytic null — dimension-aware, so a
    384-dim corpus is judged by 384-dim chance); on clustered corpora nn1
    sits at the in-cluster cosine regardless of cluster COUNT — the
    statistic k-means probes get wrong when probe K != true K
    (calibration: probe-K=64 top-1-centroid cosine reads a 2,000-cluster
    corpus at 0.42 vs isotropic 0.32; nn1 reads 0.84 vs 0.47).

    Scale shape: the sample is capped (``sample_cap`` rows), its
    normalized matrix broadcasts (S x dim float64, 8 MB at 16k x 64), and
    the S x S top-1 scan runs as a blocked GEMM ``mapInPandas`` over the
    sample itself — no shuffle, no driver-side pairwise loop, corpus
    never fully read beyond one count when ``n_rows`` is not supplied.

    Returns ``{"n_rows", "dim", "sample_rows", "nn1", "nn1_null",
    "clustered"}``.
    """
    import math

    if n_rows is None:
        n_rows = estimate_corpus_rows(df) or df.count()
    n_rows = int(n_rows)
    # ceil, not floor: floor gave rate=1 (no filter at all) for any corpus
    # in (cap, 2*cap), silently collecting a partition-prefix instead of a
    # hash-uniform sample — the sample must stay bounded AND unbiased for
    # every n_rows > sample_cap
    rate = max(1, -(-n_rows // max(1, sample_cap)))
    sample = df.select(
        F.col(id_col).alias("id"), V.as_double(vector_col).alias("v")
    )
    if rate > 1:
        sample = sample.filter(
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(rate)) == 0
        )
    rows = sample.collect() if n_rows <= sample_cap else None
    if rows is None:
        rows = sample.limit(sample_cap * 2).collect()
    ids = np.array([r.id for r in rows], dtype=np.int64)
    X = np.array([r.v for r in rows], dtype=np.float64)
    s_rows = len(ids)
    if s_rows < 2:
        return {
            "n_rows": n_rows, "dim": int(X.shape[1]) if X.ndim == 2 else 0,
            "sample_rows": s_rows, "nn1": 0.0, "nn1_null": 1.0,
            "clustered": False,
        }
    dim = X.shape[1]
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    Xn = X / norms[:, None]
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((ids, Xn))

    def top1(batches):
        import pandas as pd

        b_ids, b_x = b.value
        for pdf in batches:
            Q = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(Q, axis=1)
            qn[qn == 0] = 1.0
            S = (Q / qn[:, None]) @ b_x.T
            # mask self-matches by id, not position: the sample frame and
            # the broadcast matrix may order rows differently
            qid = pdf["id"].to_numpy()
            for i, q in enumerate(qid):
                S[i, b_ids == q] = -2.0
            yield pd.DataFrame({"id": qid, "nn1": S.max(axis=1)})

    import pandas as pd

    # Arrow-path upload of the bounded sample (one batch) — the row-tuple
    # form pickled every vector element-by-element (round-11 driver fix);
    # float64 values are unchanged either way
    sdf = spark.createDataFrame(
        pd.DataFrame(
            {"id": [int(i) for i in ids],
             "v": [[float(x) for x in v] for v in X]}
        ),
        "id long, v array<double>",
    )
    agg = sdf.mapInPandas(top1, "id long, nn1 double").agg(
        F.avg("nn1").alias("m")
    ).collect()[0]
    b.unpersist()
    nn1 = float(agg.m)
    null = math.sqrt(2.0 * math.log(max(2, s_rows)) / dim)
    return {
        "n_rows": n_rows, "dim": int(dim), "sample_rows": int(s_rows),
        "nn1": round(nn1, 4), "nn1_null": round(null, 4),
        "clustered": nn1 >= null + NN1_CLUSTERED_MARGIN,
    }


def recommend_index(n_rows: int, clustered: bool) -> dict:
    """The measured round-9 decision table as the ``auto`` default —
    every branch cites the artifact that priced it:

    - clustered -> ``ivf`` multi-probe with K ≈ sqrt(n), nprobe=4: the
      STRUCTURED_RECALL_2M.json operating point (recall 0.986 at 82x over
      warm brute scanning 0.33% of a 2M-row Zipf-GMM corpus). Real
      embedding corpora live here.
    - isotropic, n < AUTO_BRUTE_MAX_ROWS -> exact ``brute``: below ~10^6
      rows warm brute beats every walk on latency (CLONES_PIPELINE_AB)
      and is exact — nothing to buy.
    - isotropic, n >= AUTO_BRUTE_MAX_ROWS -> ``two_level``: recall on
      iid-Gaussian-like data is a function of rows scanned and nearly
      index-independent (IVF_RECALL_2M.json), and at equal rows touched
      the adaptive walk dominates static cell probing (0.55 vs ~0.42 at
      36k rows/query) while serving 6.7x faster than brute at 2M
      (TWO_LEVEL_AB.json).

    Returns ``{"index_type", "params", "why"}``; ``params`` carries the
    scale-indexed knobs for the chosen index (n_cells/nprobe for ivf,
    :func:`graph_params_for` for two_level).
    """
    import math

    n = max(1, int(n_rows))
    if clustered:
        # measured operating points: nprobe=4 reads 0.986 at 2M (2,000
        # clusters) and exactly 0.950 at 5M (5,000 clusters) — the recall
        # drifts down as cluster count scales with n, so past ~4M rows the
        # table buys margin with nprobe=8 (0.964 at 5M for ~25% more serve
        # time, 90x over brute; STRUCTURED_RECALL_2M.json /
        # STRUCTURED_RECALL_5M.json)
        return {
            "index_type": "ivf",
            "params": {
                "n_cells": max(16, int(math.sqrt(n))),
                "nprobe": 4 if n < 4_000_000 else 8,
            },
            "why": "clustered corpus: IVF multi-probe >=0.95 recall at "
                   "90-120x over brute (STRUCTURED_RECALL_{2M,5M}.json)",
        }
    if n < AUTO_BRUTE_MAX_ROWS:
        return {
            "index_type": "brute",
            "params": {},
            "why": "isotropic and small: warm brute is exact and faster "
                   "than every walk below ~1M rows (CLONES_PIPELINE_AB)",
        }
    return {
        "index_type": "two_level",
        "params": graph_params_for(n),
        "why": "isotropic and large: the layered walk serves 6.7x over "
               "brute at 2M; recall there is budget-priced "
               "(TWO_LEVEL_AB.json, TWO_LEVEL_RECALL_SWEEP.json)",
    }


def ivf_search_batch(
    assigned: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Batch multi-probe IVF search: top-k per query, restricted to each
    query's ``nprobe`` nearest cells — the set-at-a-time form of
    ``IVFIndex.query`` (the reference serves a batch only as a Python
    loop, server.py:95-105; here N queries probe in ONE plan).

    Per-query probe cells are a pure Column expression (lexicographic
    ``(dist, cid)`` struct sort — identical tie-breaks to the single-query
    driver-side ranking and the SQL oracle's ``row_number``). The probed
    (query, cell) pairs BROADCAST into the assignment table; a corpus row
    joins at most once per query (it lives in exactly one cell), so the
    scored stream is Σ_q |probed cells' rows| — scan-proportional, never
    all-pairs. A literal ``IN`` filter over the union of probed cells runs
    first so the cached (batch-stat-pruned) or disk (partition-pruned)
    layouts skip unprobed cells entirely; the union is collected
    driver-side but is bounded by O(n_queries × nprobe) ints.

    Returns ``(query_id, vec_id, score, rank)`` best-first per query —
    the :func:`operators.knn.knn_join` shape."""
    from pyspark.sql import Window

    cents = sorted(
        ((int(c), [float(x) for x in v]) for c, v in centroids),
        key=lambda t: t[0],
    )
    nprobe = max(1, min(int(nprobe), len(cents)))
    qv = V.as_double(query_vec_col)
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    V.euclidean_distance(qv, V.vector_literal(cv)).alias("d"),
                    F.lit(cid).cast("int").alias("cid"),
                )
                for cid, cv in cents
            ]
        )
    )
    probe_cells = F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cid"])
    probed = queries.select(
        F.col(query_id_col),
        qv.alias("__qv"),
        F.explode(probe_cells).alias("centroid_id"),
    )
    cells = sorted(
        int(r.centroid_id)
        for r in probed.select("centroid_id").distinct().collect()
    )
    score = V.similarity(metric, V.as_double(vector_col), F.col("__qv"))
    pairs = (
        assigned.filter(F.col("centroid_id").isin(cells))
        .join(F.broadcast(probed), "centroid_id")
        .select(query_id_col, id_col, score.alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def recall_certificate(
    exact_topk: DataFrame,
    index_topk: DataFrame,
    index_type: str,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Measured serving certificate (VERDICT r10 #4 — turn "recommend"
    into "certify"): intersect an index's top-k with the exact top-k over
    the same queries and emit ONE row
    ``(index_type, n_queries, k, n_hits)`` — ``n_hits / (n_queries * k)``
    is the measured recall@k of the serving configuration, as an integer
    the SQL oracle can check bit-for-bit (the ``knn_ivf_recall``
    discipline applied to the router's operating point).

    Both inputs are sample-sized frames (S queries × k rows); everything
    here is bounded by the sample, never the corpus. Each side is
    materialized ONCE per action (LAZY localCheckpoint: lineage is
    truncated at construction, the one shared RDD computes on the
    caller's first action — construction itself stays job-free, the
    round-11 ADVICE note): the exact side is referenced by both the
    n_queries aggregate and the hit join — and on the brute route the
    index side IS the exact frame — so without this the whole
    corpus-scan + per-query-window subtree re-executed per reference
    (round-11 measurement; guide §5 — cache what is reused and bounded:
    O(S × k) rows here)."""
    same = index_topk is exact_topk
    exact_topk = exact_topk.localCheckpoint(eager=False)
    index_topk = (
        exact_topk if same else index_topk.localCheckpoint(eager=False)
    )
    ex = exact_topk.select(query_id_col, id_col)
    ap = index_topk.select(query_id_col, id_col)
    nq = ex.agg(
        F.countDistinct(query_id_col).cast("long").alias("n_queries")
    )
    hits = ex.join(ap, [query_id_col, id_col]).agg(
        F.count("*").cast("long").alias("n_hits")
    )
    return nq.crossJoin(hits).select(
        F.lit(index_type).alias("index_type"),
        "n_queries",
        F.lit(int(k)).cast("long").alias("k"),
        "n_hits",
    )


class IVFIndex:
    """Cached batch IVF index with LAZY rebuild and explicit invalidation —
    the Spark analog of the reference's ANN orchestration (ref api.py:42-62
    ``_maybe_init_ann``: rebuild when the indexed size no longer matches the
    corpus; ref api.py:35 ``ann_index = None`` is the invalidated state).

    The "index" is the corpus with a ``centroid_id`` column, persisted
    (MEMORY_AND_DISK, spills at scale); centroids live driver-side (O(cells)).
    ``query`` probes the ``nprobe`` nearest cells only — with the assignment
    cached, a probe scans ~nprobe/n_cells of the corpus and shuffles nothing.

    Staleness contract mirrors the reference: the index remembers how many
    rows it indexed; ``ensure(df)`` rebuilds iff the corpus row count moved
    (one cheap count() per ensure — the reference's ``get_all()`` equivalent).
    ``invalidate()`` is the explicit cache-invalidate op: unpersists and
    drops state, so the next query rebuilds."""

    def __init__(
        self,
        n_cells: int = 16,
        metric: str = "cosine",
        vector_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = LSH_SEED,
    ):
        self.n_cells = n_cells
        self.metric = metric
        self.vector_col = vector_col
        self.id_col = id_col
        self.seed = seed
        self._assigned: DataFrame | None = None
        self._centroids: list[tuple[int, list[float]]] | None = None
        self._indexed_rows = -1
        # disk-backed state: set by load(); _mutated tracks in-memory drift
        # (add_items/rebalance) so save() back to the source path knows
        # whether it is a no-op or needs the staging swap
        self._source_path: str | None = None
        self._mutated = False

    # -- build / invalidate (≙ _maybe_init_ann / ann_index = None) -----------

    def build(self, df: DataFrame) -> "IVFIndex":
        """(Re)build: train centroids, assign cells, persist the assignment.
        The count() both materializes the cache and records the indexed size
        used by the staleness check.

        The assignment is RANGE-partitioned and sorted on ``centroid_id``
        before the persist: each in-memory columnar batch then covers a
        narrow centroid_id range, so a probe's ``centroid_id IN (...)``
        filter skips whole cached batches via the batch min/max stats
        (InMemoryTableScan partition-batch pruning, on by default). Without
        the clustering, a probe still READ all 200k cached rows and only
        saved the scoring — measured slower than brute force at sf10; with
        it, a 1-cell probe touches ~1/n_cells of the cache. One extra
        shuffle at build time buys scan-proportionality at query time —
        the same layout decision as writing a table partitioned by its
        filter column."""
        self.invalidate()
        cents_df = train_ivf_centroids(
            df, self.n_cells, vector_col=self.vector_col, seed=self.seed
        )
        self._centroids = [
            (int(r.centroid_id), [float(x) for x in r.centroid])
            for r in cents_df.collect()
        ]
        assigned = (
            ivf_assign(df, cents_df, vector_col=self.vector_col)
            .repartitionByRange(max(self.n_cells // 2, 1), "centroid_id")
            .sortWithinPartitions("centroid_id")
            .persist()
        )
        self._indexed_rows = assigned.count()
        self._assigned = assigned
        self._source_path = None
        self._mutated = False
        return self

    def add_items(self, new_df: DataFrame) -> "IVFIndex":
        """Incremental ANN insert (≙ reference src/vectordb/ann.py:78-91
        ``add_items``/``resize_index``): assign ONLY the new batch to the
        EXISTING centroids — a scan-side argmin over the new rows, no
        retrain, no full-corpus pass — and append it to the cached
        assignment. Centroids stay frozen, exactly as an HNSW insert grows
        the graph without moving entry points; the standard IVF maintenance
        trade-off (cells drift as the distribution moves) is answered by
        the rebuild path: ``ensure()`` still retrains when invalidated.
        Cost is O(|new batch|) — the reference's resize+add is O(new) too,
        while its initial build is O(corpus), same asymmetry."""
        if self._assigned is None or self._centroids is None:
            return self.build(new_df)
        spark = new_df.sparkSession
        cents_df = spark.createDataFrame(
            self._centroids, "centroid_id: int, centroid: array<double>"
        )
        assigned_new = ivf_assign(new_df, cents_df, vector_col=self.vector_col)
        old = self._assigned
        merged = old.unionByName(assigned_new).persist()
        self._indexed_rows = merged.count()
        old.unpersist()
        self._assigned = merged
        self._mutated = True
        return self

    def invalidate(self) -> None:
        """Explicit cache invalidation: the next ensure()/query() rebuilds."""
        if self._assigned is not None:
            self._assigned.unpersist()
        self._assigned = None
        self._centroids = None
        self._indexed_rows = -1
        self._source_path = None
        self._mutated = False

    def is_stale(self, df: DataFrame) -> bool:
        """≙ reference ``ann_index is None or _ann_index_size != n_vectors``."""
        return self._assigned is None or df.count() != self._indexed_rows

    def _content_fingerprint(self, df: DataFrame) -> int:
        """See :func:`corpus_fingerprint`; on the cached assignment it
        reads in-memory blocks only."""
        return corpus_fingerprint(df, self.id_col, self.vector_col)

    def ensure(self, df: DataFrame) -> "IVFIndex":
        """Lazy maintenance orchestration (reference rebuilds on access, not
        on write — api.py:42-62 — and inserts incrementally when the index
        already exists — api.py:63-79 via ann.add_items): cheap no-op when
        fresh; when the corpus GREW by pure appends (every indexed id still
        present with UNCHANGED content, only new ids added) the delta is
        folded in via :meth:`add_items` — O(|delta|), centroids frozen, no
        retrain; any other drift (updates, deletes) forces the full
        rebuild. The append-vs-drift test is an anti-join on the id column
        + two counts, and — before committing to the incremental path — an
        (id, vector) fingerprint over the overlapping rows: without it, a
        corpus whose existing vectors were updated in place AND new ids
        appended would reconcile as a pure append and leave stale cached
        assignments serving queries. All of it is paid by the SEARCH path,
        keeping writes zero-job. Contract bound (same as the reference's
        size-only check, src/vectordb/api.py:63-79): count-preserving pure
        in-place updates with NO appends are not detected — call
        :meth:`invalidate` after such a rewrite."""
        if self._assigned is None or self._centroids is None:
            return self.build(df)
        n = df.count()
        if n == self._indexed_rows:
            return self
        delta = df.join(
            self._assigned.select(self.id_col), self.id_col, "left_anti"
        )
        if self._indexed_rows + delta.count() == n:
            overlap_unchanged = self._content_fingerprint(
                df.join(self._assigned.select(self.id_col), self.id_col,
                        "left_semi")
            ) == self._content_fingerprint(self._assigned)
            if overlap_unchanged:
                return self.add_items(delta)
        return self.build(df)

    def cell_sizes(self) -> dict[int, int]:
        """Per-cell row counts — one small groupBy over the cached
        assignment (O(cells) rows to the driver)."""
        rows = self._assigned.groupBy("centroid_id").count().collect()
        return {int(r["centroid_id"]): int(r["count"]) for r in rows}

    def rebalance(self, max_cell_size: int, max_rounds: int = 8,
                  lloyd_steps: int = 2) -> "IVFIndex":
        """IVF cell maintenance — the batch analog of the reference's HNSW
        ``resize_index`` (src/vectordb/ann.py:78-91 grows the graph's
        capacity in place so inserts never force a rebuild): repeated
        :meth:`add_items` freezes centroids, so a hot region's cell grows
        without bound and every probe touching it degenerates toward a
        full scan. Instead of the all-or-nothing full retrain, split each
        oversized cell IN PLACE: train k=2 centroids inside the cell
        (seeded KMeans over only that cell's rows), reassign only those
        rows (one keeps the old cell id, one gets a fresh id), and leave
        every other cell's assignment untouched. Repeats until every cell
        fits the bound, a round makes no progress (a cell of identical
        vectors cannot split), or ``max_rounds``.

        Scale: ALL oversized cells split together in the SAME jobs — per
        round, one O(cells) size census, one window pass that picks
        ``k_c = ceil(size_c / max_cell_size)`` deterministic seed rows per
        hot cell (the k_c lowest salted ``xxhash64(id)`` — a k-way split,
        so one round normally suffices instead of log2 binary-split
        rounds), ``lloyd_steps`` scan-side assign + keyed-aggregate
        passes over only the hot cells' cached rows, and one final
        reassignment — a handful of jobs per round regardless of how many
        cells are hot, O(rows in oversized cells), never a full-corpus
        retrain and never a driver-side per-cell loop. Per-cell split
        centroids ride along as inline literals keyed by a CASE on the
        cell id, the same O(cells) small-table contract as
        :func:`ivf_assign`. Query semantics are unchanged: the cell
        partition just gets finer where it was hot, and an exhaustive
        probe still equals exact kNN."""
        if self._assigned is None or self._centroids is None:
            raise ValueError("rebalance() requires a built index")
        from pyspark.sql import Window

        vc = self.vector_col

        def _side_expr(seed_map: dict[int, list[list[float]]]):
            """side = argmin distance to THIS row's cell's split seeds
            (ties -> lowest side, Spark's lexicographic struct min), as a
            pure Column CASE over the cell id."""
            v = V.as_double(vc)
            expr = F.lit(0)
            for cid, seeds in seed_map.items():
                best = F.array_min(F.array(*[
                    F.struct(
                        V.euclidean_distance(v, V.vector_literal(sv))
                        .alias("d"),
                        F.lit(j).cast("int").alias("j"),
                    )
                    for j, sv in enumerate(seeds)
                ]))["j"]
                expr = F.when(F.col("centroid_id") == int(cid), best)\
                    .otherwise(expr)
            return expr

        sizes = self.cell_sizes()
        for rnd in range(max_rounds):
            oversized = sorted(
                int(cid) for cid, s in sizes.items() if s > max_cell_size)
            if not oversized:
                break
            k_of = {
                cid: max(2, -(-sizes[cid] // max_cell_size))
                for cid in oversized
            }
            cold = self._assigned.filter(
                ~F.col("centroid_id").isin(oversized))
            hot = self._assigned.filter(F.col("centroid_id").isin(oversized))
            # k_c deterministic seed rows per hot cell in one window pass;
            # the hash is salted by the round so a degenerate draw (cells
            # of near-identical vectors) gets a different one next time
            k_expr = F.lit(2)
            for cid, k in k_of.items():
                k_expr = F.when(F.col("centroid_id") == int(cid),
                                F.lit(int(k))).otherwise(k_expr)
            w = Window.partitionBy("centroid_id").orderBy("_h")
            seed_rows = (
                hot.withColumn(
                    "_h", F.xxhash64(F.col(self.id_col), F.lit(rnd)))
                .withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= k_expr)
                .select("centroid_id", "_r", vc)
                .collect()
            )
            seed_map: dict[int, list[list[float]]] = {}
            for r in sorted(seed_rows, key=lambda r: (r["centroid_id"],
                                                      r["_r"])):
                seed_map.setdefault(int(r["centroid_id"]), []).append(
                    [float(x) for x in r[vc]])
            dim = len(next(iter(seed_map.values()))[0])
            for _ in range(lloyd_steps):
                # one scan-side assign + one keyed aggregate over hot rows
                # refines EVERY hot cell's seed set simultaneously
                means = (
                    hot.withColumn("_side", _side_expr(seed_map))
                    .groupBy("centroid_id", "_side")
                    .agg(F.array(*[
                        F.avg(V.as_double(vc)[i]) for i in range(dim)
                    ]).alias("_mean"))
                    .collect()
                )
                for r in means:
                    cid, side = int(r["centroid_id"]), int(r["_side"])
                    seed_map[cid][side] = [float(x) for x in r["_mean"]]
            cents = dict(self._centroids)
            next_id = max(cents) + 1
            remap = F.col("centroid_id")
            for cid in oversized:
                cents[cid] = seed_map[cid][0]
                for j in range(1, len(seed_map[cid])):
                    cents[next_id] = seed_map[cid][j]
                    remap = F.when(
                        (F.col("centroid_id") == int(cid))
                        & (F.col("_side") == j),
                        F.lit(int(next_id)),
                    ).otherwise(remap)
                    next_id += 1
            split = (
                hot.withColumn("_side", _side_expr(seed_map))
                .withColumn("centroid_id", remap.cast("int"))
                .drop("_side")
            )
            # localCheckpoint, not persist: each round's remap stacks a
            # CASE-over-literals + union on top of the previous round's
            # plan, and EVERY later action (census, lloyd passes, the
            # final probe) re-analyzes that whole growing tree even though
            # execution reads the cache (measured round 11: wall 25.9 s vs
            # 10.7 s of actual job time on this row — the gap is driver
            # planning). Truncating the lineage per round keeps later
            # plans rooted at the materialized frame. Same rows, same
            # cache residency; LAZY (eager=False) so the cell_sizes()
            # census that follows is the round's ONE materializing action
            # rather than a second job after an eager checkpoint.
            merged = cold.unionByName(split).localCheckpoint(eager=False)
            self._assigned.unpersist()
            self._assigned = merged
            self._mutated = True
            self._centroids = sorted(cents.items())
            after = self.cell_sizes()  # materializes the new cache too
            if after == sizes:  # identical-vector cell: cannot split
                break
            sizes = after
        return self

    # -- read path ------------------------------------------------------------

    def _probe_cells(self, query_vector: Sequence[float], nprobe: int) -> list[int]:
        """Driver-side nearest-centroid ranking, same euclidean fold order as
        the executor-side assignment expression."""
        qv = [float(x) for x in query_vector]

        def dist(c):
            s = 0.0
            for a, b in zip(qv, c):
                d = a - b
                s += d * d
            return s

        ranked = sorted(self._centroids, key=lambda t: (dist(t[1]), t[0]))
        return [cid for cid, _ in ranked[:nprobe]]

    def query(
        self,
        df: DataFrame,
        query_vector: Sequence[float],
        k: int = 5,
        nprobe: int = 1,
        assume_fresh: bool = False,
    ) -> DataFrame:
        """Approximate kNN: exact search restricted to the nprobe nearest
        cells of the cached assignment. Lazily rebuilds first if stale.

        ``assume_fresh=True`` skips the per-query staleness check when the
        index is already built. The reference's check is an O(1) in-memory
        size compare per access (api.py:42-62); the Spark analog
        (``ensure``'s corpus ``count()``) is a whole extra JOB per query —
        measured ~15% of sf10 serving p50 — so a serving loop that owns
        the freshness contract (build/ensure once, then a read-only query
        burst, the reference's own deployment shape) opts out per query.
        Ignored (the check still runs) when no index exists yet."""
        if not assume_fresh or self._assigned is None:
            self.ensure(df)
        probe = self._probe_cells(query_vector, nprobe)
        return K.knn(
            self._assigned.filter(F.col("centroid_id").isin(probe)),
            query_vector,
            k=k,
            metric=self.metric,
            vector_col=self.vector_col,
            id_col=self.id_col,
        )

    def query_batch(
        self,
        df: DataFrame,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 1,
        assume_fresh: bool = False,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
    ) -> DataFrame:
        """Batch multi-probe kNN over the cached assignment — N queries in
        ONE plan (:func:`ivf_search_batch`); same freshness contract as
        :meth:`query`."""
        if not assume_fresh or self._assigned is None:
            self.ensure(df)
        return ivf_search_batch(
            self._assigned,
            self._centroids,
            queries,
            k=k,
            nprobe=nprobe,
            metric=self.metric,
            id_col=self.id_col,
            vector_col=self.vector_col,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        )

    # -- disk layout: the 100 TB serving path --------------------------------

    SIDECAR = "_ivf_index.json"

    def save(self, path: str) -> "IVFIndex":
        """Persist the index as a parquet table ``partitionBy(centroid_id)``
        plus a JSON sidecar holding the centroids (O(cells), driver-side
        state — same sidecar convention as sources/store.py).

        This is the layout the cached path only approximates: with the cell
        id a PARTITION COLUMN, a probe's ``centroid_id IN (...)`` prunes at
        the file listing — Spark schedules tasks only for the probed cells'
        files, so per-query cost is O(corpus/n_cells) tasks AND bytes, not
        a filter evaluated over every cached batch. At 100 TB the cache
        doesn't fit anyway; the partitioned table is the index. The
        range-partitioned write keeps ~1 file per cell (no small-files
        explosion across cells)."""
        if self._assigned is None or self._centroids is None:
            raise ValueError("index not built; call build()/ensure() first")
        clustered = self._assigned.repartitionByRange(
            max(self.n_cells // 2, 1), "centroid_id"
        )
        if self._source_path is not None and os.path.realpath(
            path
        ) == os.path.realpath(self._source_path):
            # a loaded index's _assigned plan READS the table at `path`: a
            # plain overwrite would delete the files it reads (Spark rejects
            # the shape with "Cannot overwrite a path that is also being
            # read from"). Unmutated → the bytes on disk already ARE the
            # saved form, no-op; mutated (add_items/rebalance since load) →
            # write to a staging dir and rename-aside swap (the
            # store.compact pattern), then re-point at the fresh table.
            if not self._mutated:
                return self
            import shutil

            spark = self._assigned.sparkSession
            staging, backup = path + ".stage", path + ".old"
            clustered.write.mode("overwrite").partitionBy("centroid_id").parquet(
                staging
            )
            os.rename(path, backup)
            os.rename(staging, path)
            shutil.rmtree(backup)
            self._assigned.unpersist()
            self._assigned = spark.read.parquet(path)
            self._mutated = False
        else:
            clustered.write.mode("overwrite").partitionBy("centroid_id").parquet(
                path
            )
        sidecar = {
            "n_cells": self.n_cells,
            "metric": self.metric,
            "vector_col": self.vector_col,
            "id_col": self.id_col,
            "seed": self.seed,
            "indexed_rows": self._indexed_rows,
            "centroids": [[cid, vec] for cid, vec in self._centroids],
        }
        with open(os.path.join(path, self.SIDECAR), "w", encoding="utf-8") as f:
            json.dump(sidecar, f)
        return self

    def entry_points(self, n_per_cell: int = 1) -> list[int]:
        """Graph-walk entry selection from the index already built/on disk —
        the batch analog of HNSW's maintained entry point (reference
        src/vectordb/ann.py:93-102 descends from a fixed entry): for each
        cell, the ``n_per_cell`` member rows NEAREST their centroid
        (euclidean, ties -> lowest id). One window pass over the cached /
        partition-pruned assignment; O(cells · n_per_cell) ids to the driver
        — the same small-state contract as the centroids themselves. Feed
        the result to :func:`graph_beam_search` so the walk starts from a
        spread of central, well-connected nodes instead of caller-fixed
        ids."""
        if self._assigned is None or self._centroids is None:
            raise ValueError("entry_points() requires a built index")
        from pyspark.sql import Window

        v = V.as_double(self.vector_col)
        # distance to THIS row's assigned centroid, as a CASE over the cell id
        d = F.lit(float("inf"))
        for cid, cv in self._centroids:
            d = F.when(
                F.col("centroid_id") == int(cid),
                V.euclidean_distance(v, V.vector_literal(cv)),
            ).otherwise(d)
        w = Window.partitionBy("centroid_id").orderBy(
            F.asc("_d"), F.asc(self.id_col)
        )
        rows = (
            self._assigned.withColumn("_d", d)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n_per_cell)
            .select(self.id_col)
            .collect()
        )
        return sorted(int(r[0]) for r in rows)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFIndex":
        """Open a saved index WITHOUT caching: ``_assigned`` is the
        partitioned parquet table itself, so ``query()`` plans a
        partition-pruned scan of the probed cells only. ``ensure()``
        semantics carry over unchanged (a drifted corpus forces an
        in-memory rebuild).

        Crash recovery (mirrors sources/store.py compact's self-heal): the
        save() in-place swap is rename(path -> path.old); rename(path.stage
        -> path). A crash between the renames leaves only ``path.old`` —
        heal by renaming it back (and dropping a half-written stage dir)
        before reading, so a torn save degrades to the PREVIOUS index
        instead of FileNotFoundError."""
        if not os.path.exists(os.path.join(path, cls.SIDECAR)) and os.path.isdir(
            path + ".old"
        ):
            import shutil

            if os.path.isdir(path):  # torn stage-rename: path exists but no sidecar
                shutil.rmtree(path)
            if os.path.isdir(path + ".stage"):
                shutil.rmtree(path + ".stage")
            os.rename(path + ".old", path)
        with open(os.path.join(path, cls.SIDECAR), encoding="utf-8") as f:
            meta = json.load(f)
        idx = cls(
            n_cells=int(meta["n_cells"]),
            metric=meta["metric"],
            vector_col=meta["vector_col"],
            id_col=meta["id_col"],
            seed=int(meta["seed"]),
        )
        idx._centroids = [
            (int(cid), [float(x) for x in vec]) for cid, vec in meta["centroids"]
        ]
        idx._indexed_rows = int(meta["indexed_rows"])
        idx._assigned = spark.read.parquet(path)
        idx._source_path = path
        return idx


def _make_block_topm_kernel(m_metric: str, m_edges: int,
                            score_tier: str = "exact"):
    """mapInPandas kernel over (same, rows_a, rows_b) block pairs emitting
    each source node's top-``m_edges`` DIRECTED neighbors within the pair —
    the map-side combine for a distributed k-NN-graph build. Scoring shares
    the dedup block-GEMM discipline (operators/dedup.py _make_block_scorer):
    unit-normalize rows first for cosine, accumulate dimension-by-dimension
    in the exact IEEE fold order of the SQL oracle's
    ``list_dot_product(unit(a), unit(b))`` form, no BLAS reorder.

    ``score_tier``: ``'exact'`` (default) is the oracle tier above —
    bit-identical to DuckDB, but each block pair materializes dim
    full-size outer-product temporaries (memory-bandwidth bound: ~25 GB
    of traffic per 4096x4096 pair at dim=64 — measured as the 5M-rung
    wall). ``'gemm'`` scores with ONE BLAS matmul per pair (same math,
    hardware reduction order, ~1e-15 relative difference) — the
    throughput tier for scale rehearsals, same two-tier contract as
    ``ivf_assign_gemm`` / ``knn_graph_cells(assign_tier=)``; edge SETS
    match the exact tier except on exact score ties between distinct
    continuous vectors (pytest-pinned parity on the test fixtures).

    Correctness of the partial top-M: any candidate this kernel drops is
    dominated by ``m_edges`` candidates from the SAME block pair under the
    total order (score DESC, dst ASC) — all of which survive to the global
    window — so it can never be in the node's global top-M. The output is
    therefore bounded by m_edges rows per (src, block pair), while the n_a×n_b
    pair VOLUME is only ever touched as a vectorized GEMM, never materialized
    as shuffle rows (the round-5 verdict's quadratic row fan-out, killed)."""

    def topm_blocks(batches):
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

        def emit(ids_src, ids_dst, S, out):
            # per-src top-m under (score DESC, dst ASC): reorder columns by
            # dst ASC once, then one stable descending-score argsort per row
            # — the stable sort preserves the dst-ASC tie order.
            ordc = np.argsort(ids_dst, kind="stable")
            S2 = S[:, ordc]
            dsts = ids_dst[ordc]
            take = min(m_edges, S2.shape[1])
            if take == 0:
                return
            order = np.argsort(-S2, axis=1, kind="stable")[:, :take]
            sc = np.take_along_axis(S2, order, axis=1).ravel()
            dd = dsts[order].ravel()
            ss = np.repeat(ids_src, take)
            keep = np.isfinite(sc)  # -inf = masked self pair
            out[0].append(ss[keep])
            out[1].append(dd[keep])
            out[2].append(sc[keep])

        gemm = score_tier == "gemm"

        def score_pair(A, B):
            if gemm:
                if m_metric == "euclidean":
                    d2 = (
                        (A * A).sum(axis=1)[:, None]
                        - 2.0 * (A @ B.T)
                        + (B * B).sum(axis=1)[None, :]
                    )
                    return 1.0 / (1.0 + np.sqrt(np.maximum(d2, 0.0)))
                return A @ B.T  # cosine rows already unit; dot as-is
            acc = np.zeros((len(A), len(B)))
            for i in range(A.shape[1]):  # exact fold order, no BLAS reorder
                if m_metric == "euclidean":
                    d = np.subtract.outer(A[:, i], B[:, i])
                    acc = acc + d * d
                else:
                    acc = acc + np.multiply.outer(A[:, i], B[:, i])
            return 1.0 / (1.0 + np.sqrt(acc)) if m_metric == "euclidean" else acc

        for pdf in batches:
            out = ([], [], [])
            for same, ra, rb in zip(pdf["same"], pdf["rows_a"], pdf["rows_b"]):
                ids_a, A = unpack(ra)
                ids_b, B = (ids_a, A) if same else unpack(rb)
                if m_metric == "cosine":
                    A = unit(A)
                    B = A if same else unit(B)
                S = score_pair(A, B)
                if same:
                    np.fill_diagonal(S, -np.inf)  # no self edges
                    emit(ids_a, ids_b, S, out)
                else:
                    emit(ids_a, ids_b, S, out)
                    emit(ids_b, ids_a, S.T, out)
            yield pd.DataFrame(
                {
                    "src": np.concatenate(out[0]) if out[0] else np.array([], np.int64),
                    "dst": np.concatenate(out[1]) if out[1] else np.array([], np.int64),
                    "score": np.concatenate(out[2]) if out[2] else np.array([], np.float64),
                }
            )

    return topm_blocks


def knn_graph(
    df: DataFrame,
    planes: Sequence,
    m: int = 8,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    metric: str = "cosine",
    blocks_per_bucket: int | None = None,
    row_cap: int = 4096,
    n_waves: int | None = None,
    work_dir: str | None = None,
    score_tier: str = "exact",
    merge_buckets: int | None = None,
) -> DataFrame:
    """Directed k-NN GRAPH over the corpus — the batch analog of HNSW's
    graph construction (reference src/vectordb/ann.py:21-76 ``HNSWIndex
    ._init_index/build``; its ``M`` is this ``m``): each node keeps edges to
    its ``m`` most-similar neighbors among all rows it collides with in ANY
    of R independent sign-LSH plane sets. ``planes`` is either one plane set
    (``list[vector]``) or a list of R plane sets; with single-set collision
    recall ``p`` the union reaches ``1-(1-p)^R`` (independent Gaussian draws),
    which is what lifts the beam walk from the round-5 0.40 recall@10 to
    reference-quality — the multi-probe discipline HNSW gets from its layered
    graph, re-expressed as independent hash tables.

    Scale shape: bucketize is a pure scan expression exploded R ways (one
    shuffle keyed by the small (table, bucket, block) int tuple), in-bucket
    scoring is the dedup block-GEMM kernel with a per-(src, block-pair)
    partial top-M — so shuffle rows OUT of the kernel are bounded by
    R·blocks·m per node regardless of bucket population, and the
    n_b² pair volume exists only inside vectorized GEMM batches. Dedup of the
    same pair colliding in several plane sets (bit-identical score — same
    kernel, same fold) and the final per-node top-M are one groupBy + one
    window over that bounded candidate set. Fully deterministic (score DESC,
    dst ASC), so the whole graph is oracle-checkable in SQL.

    Blocking self-scales by default: ``blocks_per_bucket=None`` sizes the
    salt PER (plane-set, bucket) from that bucket's population so each
    aggregated block holds ~``row_cap`` rows no matter how hot the bucket
    (:func:`_salted_pack` — the executor-memory guard the round-6 fixed
    ``blocks_per_bucket=2`` default lacked; the graph is blocking-invariant,
    so answers are unchanged). Pass an int to pin the legacy fixed salt.

    ``n_waves``/``work_dir``: route through :func:`_waved_edge_build` —
    identical edges, in-flight shuffle bounded to O(corpus / n_waves)
    instead of O(R × corpus); the single-box answer to the measured 20M
    spill wall. Returns ``(src, dst, score)``."""
    m_l = metric.lower()
    if m_l not in V.SUPPORTED_METRICS:
        raise ValueError(f"Unknown metric: {metric!r}. Supported: {V.SUPPORTED_METRICS}")
    plane_sets = [planes] if isinstance(planes[0][0], (int, float)) else list(planes)
    src = df.select(F.col(id_col).alias("id"), V.as_double(vector_col).alias("v"))
    keys = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("r"),
                bucket_expr(F.col("v"), ps).alias("bkt"),
            )
            for r, ps in enumerate(plane_sets)
        ]
    )
    keyed = src.select("id", "v", F.explode(keys).alias("k")).select(
        "id", "v", F.col("k.r").alias("r"), F.col("k.bkt").alias("bkt")
    )
    if n_waves is not None and n_waves > 1:
        if not work_dir:
            raise ValueError("knn_graph: n_waves > 1 requires work_dir")
        return _waved_edge_build(
            keyed, ["r", "bkt"], m_l, m, n_waves, work_dir,
            blocks_per_bucket, row_cap, score_tier, merge_buckets,
        )
    packed = _salted_pack(keyed, ["r", "bkt"], blocks_per_bucket, row_cap)
    cand = _block_pairs(packed, ["r", "bkt"]).mapInPandas(
        _make_block_topm_kernel(m_l, m, score_tier),
        "src long, dst long, score double",
    )
    return _topm_edges(cand, m)


def knn_graph_cells(
    df: DataFrame,
    centroids: DataFrame,
    m: int = 8,
    assigns: int = 2,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    metric: str = "cosine",
    blocks_per_bucket: int | None = None,
    row_cap: int = 4096,
    assign_tier: str = "gemm",
    batch_rows: int = 4096,
    n_waves: int | None = None,
    work_dir: str | None = None,
    score_tier: str = "exact",
    merge_buckets: int | None = None,
) -> DataFrame:
    """Directed k-NN graph with K-MEANS-CELL candidate generation — the
    data-ADAPTIVE counterpart of :func:`knn_graph`'s sign-LSH bucketing
    (same reference analog: HNSW graph construction,
    src/vectordb/ann.py:21-76; candidate generation is the part hnswlib
    gets from its incremental greedy inserts). Round-9 forensics
    (REFINE_CONVERGENCE.json): data-OBLIVIOUS hyperplanes capture a
    ~0.6-cosine true-neighbor pair with p ~ (1-θ/π)^planes and planes grow
    with n, so at 2M×64 direct edge capture was 2.9% and neither walk
    budgets, NN-descent, nor symmetrization could recover. K-means cells
    move WITH the data: each node joins its ``assigns`` nearest cells, a
    pair is a candidate iff it shares ≥1 cell — capture now tracks the
    local cell geometry instead of decaying in n.

    Scale shape: identical to knn_graph past candidate generation — the
    (node → top-A cells) assignment is one broadcast-GEMM scan
    (:func:`ivf_assign_gemm`'s kernel generalized to top-A), packing is
    the population-derived :func:`_salted_pack` keyed on the cell id, in-
    bucket scoring is the same block-GEMM partial-top-M kernel, then the
    shared single-Exchange dedup tail. Same-pair-in-both-cells dedups
    under max() (identical score bits — same kernel, same fold).

    ``assign_tier='expr'`` computes the top-A cells with the EXPRESSION-
    level bit-exact distance (centroids collected as literals, exploded,
    per-id window) so the whole graph is SQL-oracle-checkable; 'gemm' is
    the throughput tier (np.argsort(d², stable) — ties to lowest cid,
    same contract as ivf_assign_gemm, parity pytest-pinned).
    Returns ``(src, dst, score)``."""
    m_l = metric.lower()
    if m_l not in V.SUPPORTED_METRICS:
        raise ValueError(
            f"Unknown metric: {metric!r}. Supported: {V.SUPPORTED_METRICS}"
        )
    a_n = int(assigns)
    if a_n < 1:
        raise ValueError(f"assigns must be >= 1, got {assigns}")
    cent_rows = centroids.select(
        F.col("centroid_id").cast("int").alias("_cid"),
        V.as_double("centroid").alias("_cv"),
    ).collect()
    if not cent_rows:
        raise ValueError("knn_graph_cells: empty centroid frame")
    cent_rows.sort(key=lambda r: r._cid)
    src = df.select(
        F.col(id_col).alias("id"), V.as_double(vector_col).alias("v")
    )
    if assign_tier == "expr":
        from pyspark.sql import Window

        ds = F.array(*[
            F.struct(
                V.euclidean_distance(F.col("v"), V.vector_literal(r._cv))
                .alias("d"),
                F.lit(int(r._cid)).cast("int").alias("cid"),
            )
            for r in cent_rows
        ])
        w_a = Window.partitionBy("id").orderBy(
            F.col("e.d").asc(), F.col("e.cid").asc()
        )
        keyed = (
            src.select("id", "v", F.explode(ds).alias("e"))
            .withColumn("arn", F.row_number().over(w_a))
            .filter(F.col("arn") <= a_n)
            .select("id", "v", F.col("e.cid").alias("bkt"))
        )
    elif assign_tier == "gemm":
        import numpy as np

        cids = np.array([r._cid for r in cent_rows], dtype=np.int32)
        C = np.array([r._cv for r in cent_rows], dtype=np.float64)
        c_sq = (C * C).sum(axis=1)
        bsz = int(batch_rows)
        top_a = min(a_n, len(cent_rows))

        def assign(batches):
            import pandas as pd

            for pdf in batches:
                for lo in range(0, len(pdf), bsz):
                    chunk = pdf.iloc[lo:lo + bsz]
                    X = np.stack(chunk["v"].to_numpy())
                    d2 = (
                        (X * X).sum(axis=1)[:, None]
                        - 2.0 * (X @ C.T)
                        + c_sq[None, :]
                    )
                    # stable sort: equidistant cells -> lowest cid first
                    order = np.argsort(d2, axis=1, kind="stable")[:, :top_a]
                    ids = np.repeat(chunk["id"].to_numpy(), top_a)
                    yield pd.DataFrame({
                        "id": ids,
                        "v": chunk["v"].iloc[
                            np.repeat(np.arange(len(chunk)), top_a)
                        ].to_numpy(),
                        "bkt": cids[order].ravel(),
                    })

        id_sql_type = df.schema[id_col].dataType.simpleString()
        keyed = src.mapInPandas(
            assign, f"id {id_sql_type}, v array<double>, bkt int"
        )
    else:
        raise ValueError(f"Unknown assign_tier: {assign_tier!r}")
    if n_waves is not None and n_waves > 1:
        if not work_dir:
            raise ValueError("knn_graph_cells: n_waves > 1 requires work_dir")
        return _waved_edge_build(
            keyed, ["bkt"], m_l, m, n_waves, work_dir,
            blocks_per_bucket, row_cap, score_tier, merge_buckets,
        )
    packed = _salted_pack(keyed, ["bkt"], blocks_per_bucket, row_cap)
    cand = _block_pairs(packed, ["bkt"]).mapInPandas(
        _make_block_topm_kernel(m_l, m, score_tier),
        "src long, dst long, score double",
    )
    return _topm_edges(cand, m)


def _topm_edges(cand: DataFrame, m: int) -> DataFrame:
    """Dedup candidate edges (same pair from several plane sets carries
    identical score bits — same kernel, same fold) and keep each node's
    top-m. ONE Exchange: repartitioning by ``src`` satisfies BOTH the
    (src, dst) aggregate's clustering (hash(src) co-locates every
    (src, ·) row) and the per-src window, so Catalyst plans
    partial-agg → Exchange(src) → final-agg → window with no second
    shuffle — verified in tests/test_plans.py."""
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    return (
        cand.repartition("src")
        .groupBy("src", "dst")
        .agg(F.max("score").alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= m)
        .drop("rn")
    )


def knn_graph_refine(
    graph: DataFrame,
    df: DataFrame,
    m: int,
    expand: int = 8,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """One NN-DESCENT round (Dong et al., WWW 2011: "Efficient k-nearest
    neighbor graph construction for generic similarity measures"): improve
    a k-NN graph by scoring each node against its neighbors' neighbors —
    "a neighbor of a neighbor is likely a neighbor". The LSH-bucketed build
    (:func:`knn_graph`) captures only pairs that collide in some plane set;
    at 2M×64 that direct-capture rate is a few percent, which caps the
    walk's reachable recall no matter the beam budget (the round-8 sweep's
    0.877 ceiling, TWO_LEVEL_RECALL_SWEEP.json). NN-descent closes exactly
    that gap, using the graph itself as the candidate generator.

    Shape: per node keep its top-``expand`` out-edges AND top-``expand``
    in-edges (score DESC, id ASC — deterministic), form each node b's
    symmetric neighborhood {b} ∪ N(b); every ordered pair inside a
    neighborhood is a candidate, scored by the SAME block-GEMM kernel as
    the build (bit-identical scores, so old and new edges merge under
    max()), then per-node top-``m`` over old ∪ new. Each round is
    monotone: an old edge is only displaced by a strictly better candidate
    under the total order.

    Scale shape: candidate volume is ≤ (2·expand+1)² per MIDDLE node —
    independent of corpus size and of hub in-degree (the in-edge cut is
    capped by the same window) — and lives only inside the vectorized GEMM;
    the only corpus-sized shuffles are the neighborhood membership list
    (n·(2·expand+1) rows) and the final top-m. No broadcast of anything
    corpus-sized, so the round runs identically on a 1000-executor cluster.
    Fully deterministic and SQL-replicable (the driver gate unrolls it).
    Returns the refined ``(src, dst, score)`` edge list."""
    from pyspark.sql import Window

    m_l = metric.lower()
    if m_l not in V.SUPPORTED_METRICS:
        raise ValueError(f"Unknown metric: {metric!r}. Supported: {V.SUPPORTED_METRICS}")
    ex = int(expand)
    w_f = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    w_r = Window.partitionBy("dst").orderBy(F.desc("score"), F.asc("src"))
    fwd = (
        graph.withColumn("rn", F.row_number().over(w_f))
        .filter(F.col("rn") <= ex)
        .select(F.col("src").alias("b"), F.col("dst").alias("x"))
    )
    rev = (
        graph.withColumn("rn", F.row_number().over(w_r))
        .filter(F.col("rn") <= ex)
        .select(F.col("dst").alias("b"), F.col("src").alias("x"))
    )
    self_m = df.select(
        F.col(id_col).alias("b"), F.col(id_col).alias("x")
    )
    memb = fwd.union(rev).union(self_m).distinct()
    vec = df.select(F.col(id_col).alias("x"), V.as_double(vector_col).alias("v"))
    keyed = memb.join(vec, "x").select(
        F.col("x").alias("id"), "v",
        F.lit(0).alias("r"), F.col("b").alias("bkt"),
    )
    # neighborhood population is bounded by 2·expand+1 ≪ row_cap, so a
    # single block per bucket needs no population census
    packed = _salted_pack(keyed, ["r", "bkt"], 1, 4096)
    pairs = (
        packed.alias("a")
        .join(
            packed.alias("b"),
            (F.col("a.r") == F.col("b.r"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.blk") <= F.col("b.blk")),
        )
        .select(
            (F.col("a.blk") == F.col("b.blk")).alias("same"),
            F.col("a.rows").alias("rows_a"),
            F.col("b.rows").alias("rows_b"),
        )
    )
    cand = pairs.mapInPandas(
        _make_block_topm_kernel(m_l, m), "src long, dst long, score double"
    )
    merged = cand.unionByName(graph.select("src", "dst", "score"))
    return _topm_edges(merged, m)


def symmetrize_edges(graph: DataFrame, m_rev: int = 8) -> DataFrame:
    """Make a directed k-NN graph walkable in BOTH directions — the batch
    analog of HNSW's bidirectional links (reference src/vectordb/ann.py
    builds on hnswlib, whose ``add_point`` inserts the REVERSE link of every
    edge and prunes each node back to M). A pure out-edge top-m digraph
    concentrates in-degree on hub nodes: most nodes are reachable only
    through edges that point AWAY from them, so a beam walk stalls in hub
    basins and recall saturates no matter the beam/hops budget (the round-8
    walk sweep's 0.877 ceiling at 2M — every budget knob moved, recall
    didn't).

    Shape: the reversal is capped PER REVERSED-SOURCE NODE — for each
    original dst keep only its top-``m_rev`` in-edges (score DESC, src ASC,
    one window over the edge list) before flipping them — so a hub with
    in-degree 10⁵ contributes ``m_rev`` reverse edges, never 10⁵, and the
    walk's per-hop expansion stays bounded by m + m_rev. Edges already
    present in both directions dedup under max(score) (scores are
    symmetric: same kernel, same pair). One window + the shared
    single-Exchange dedup tail — no corpus-sized shuffle beyond the edge
    list itself, so the transform is a constant-factor pass at any scale.
    Deterministic and SQL-replicable (window + union + group-max).
    Returns ``(src, dst, score)``."""
    from pyspark.sql import Window

    w_in = Window.partitionBy("dst").orderBy(F.desc("score"), F.asc("src"))
    rev = (
        graph.withColumn("rn", F.row_number().over(w_in))
        .filter(F.col("rn") <= int(m_rev))
        .select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "score"
        )
    )
    return (
        graph.select("src", "dst", "score")
        .unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.max("score").alias("score"))
    )


def graph_params_for(n_rows: int) -> dict:
    """Scale-correct graph/walk/BUILD parameters for a FLAT k-NN graph (no
    HNSW hierarchy), encoding the measured degree law (BASELINE.md round-6
    table): navigability must come from degree, so double ``m`` per 10×
    corpus from m=16 at n≈2,000; beam ≈ 2m; hops ≈ log2(n)/2 rounded up;
    one entry cell per ~500 rows. Measured: n=500 → 0.99 recall@10,
    n=2,000 → 0.956, n=20,000 → 0.96 (m=32, beam=64, hops=6, 40 cells).

    Build-side keys (round 7): ``n_planes`` sizes the LSH bucket count so
    the EXPECTED bucket population stays near ``row_cap`` — 2^planes ≈
    n/row_cap, clamped to [3, 16] (recall comes from the R=4 plane-set
    union, held constant); ``blocks_per_bucket=None`` selects the
    population-derived salting (:func:`_salted_pack`), so even a skewed
    bucket far above the expectation is re-chunked to ~``row_cap`` rows per
    aggregated block. ``n_rows`` may itself come from
    :func:`estimate_corpus_rows` — no count job needed anywhere on the
    default path."""
    import math

    n = max(2, int(n_rows))
    m = max(8, int(16 * 2 ** max(0, math.log10(n / 2000.0))))
    row_cap = 4096
    return {
        "m": m,
        "beam": 2 * m,
        "hops": max(2, math.ceil(math.log2(n) / 2)),
        "n_entry_cells": max(4, n // 500),
        "n_plane_sets": 4,
        "n_planes": min(16, max(3, math.ceil(math.log2(max(2.0, n / row_cap))))),
        "blocks_per_bucket": None,
        "row_cap": row_cap,
    }


def knn_graph_incremental(
    graph: DataFrame,
    corpus: DataFrame,
    new: DataFrame,
    planes: Sequence,
    m: int = 8,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    metric: str = "cosine",
    blocks_per_bucket: int | None = None,
    row_cap: int = 4096,
) -> DataFrame:
    """One-sided graph-index maintenance — the graph-specific analog of the
    reference's ``add_items``/``resize_index`` (src/vectordb/ann.py:78-91:
    HNSW grows in place, inserts never force a rebuild; SURVEY §2 N3 noted
    the graph-shaped resize as out of scope until now): candidate pairs are
    generated ONLY for delta×corpus and delta×delta collisions (the
    one-sided band-join discipline of minhash_dedup_incremental), merged
    with the EXISTING edge list, and re-topped per node.

    EXACT, not approximate: for a corpus node the full-rebuild candidate
    set is collisions(corpus) ∪ collisions(delta), and under the total
    order (score DESC, dst ASC) top-M(top-M(A) ∪ B) = top-M(A ∪ B) — any
    candidate the old graph dropped was dominated by M retained edges. So
    the incremental result is bit-identical to :func:`knn_graph` over
    corpus ∪ delta (the gated oracle IS the full rebuild), at
    O(|delta| · bucket-density) cost instead of O(corpus²/buckets). The
    caller contract: ``graph`` must be the knn_graph of ``corpus`` under
    the SAME plane sets / m / metric."""
    m_l = metric.lower()
    if m_l not in V.SUPPORTED_METRICS:
        raise ValueError(f"Unknown metric: {metric!r}. Supported: {V.SUPPORTED_METRICS}")
    plane_sets = [planes] if isinstance(planes[0][0], (int, float)) else list(planes)

    def _packed(df: DataFrame) -> DataFrame:
        src = df.select(F.col(id_col).alias("id"), V.as_double(vector_col).alias("v"))
        keys = F.array(
            *[
                F.struct(
                    F.lit(r).cast("int").alias("r"),
                    bucket_expr(F.col("v"), ps).alias("bkt"),
                )
                for r, ps in enumerate(plane_sets)
            ]
        )
        keyed = src.select("id", "v", F.explode(keys).alias("k")).select(
            "id", "v", F.col("k.r").alias("r"), F.col("k.bkt").alias("bkt")
        )
        return _salted_pack(keyed, ["r", "bkt"], blocks_per_bucket, row_cap)

    delta_p, corp_p = _packed(new), _packed(corpus)
    # delta×corpus: every block combo within (r, bkt), both directions
    # (corpus nodes need their delta candidates too); same=False always —
    # the two sides are disjoint id sets, no self pairs to mask
    cross = (
        delta_p.alias("a")
        .join(
            corp_p.alias("b"),
            (F.col("a.r") == F.col("b.r")) & (F.col("a.bkt") == F.col("b.bkt")),
        )
        .select(
            F.lit(False).alias("same"),
            F.col("a.rows").alias("rows_a"),
            F.col("b.rows").alias("rows_b"),
        )
    )
    # delta×delta: the standard half-matrix
    self_pairs = (
        delta_p.alias("a")
        .join(
            delta_p.alias("b"),
            (F.col("a.r") == F.col("b.r"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.blk") <= F.col("b.blk")),
        )
        .select(
            (F.col("a.blk") == F.col("b.blk")).alias("same"),
            F.col("a.rows").alias("rows_a"),
            F.col("b.rows").alias("rows_b"),
        )
    )
    cand = cross.unionByName(self_pairs).mapInPandas(
        _make_block_topm_kernel(m_l, m), "src long, dst long, score double"
    )
    # existing edges are already (src, dst)-distinct; union them below the
    # shared single-Exchange dedup+top-m tail
    return _topm_edges(
        cand.unionByName(graph.select("src", "dst", "score")), m
    )


def graph_beam_search_batch(
    graph: DataFrame,
    df: DataFrame,
    queries: DataFrame,
    entry_ids: Sequence[int],
    beam: int = 8,
    hops: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    metric: str = "cosine",
    checkpoint: bool = True,
) -> DataFrame:
    """Batched beam search: N queries walk the graph SIMULTANEOUSLY — the
    graph-index counterpart of the batch kNN join (operators/knn.py
    knn_join; ≙ serving the reference's query loop as one plan). State is
    keyed by (query_id, node): each hop is ONE equi-join of the combined
    frontier against the edge list plus one row_number window partitioned
    by query — per-hop cost tracks Σ_q |frontier|·m and the number of
    Spark jobs is O(hops), NOT O(queries·hops). Scores are computed only
    for visited (query, node) pairs, never the full cross product.
    Returns ``(query_id, id, score)`` top-k per query, same recurrence and
    tie-breaks as :func:`graph_beam_search` per query (parity-tested).
    ``checkpoint=False`` keeps the full multi-hop lineage in one lazy plan
    (plan-contract tests); the default truncates per hop via
    localCheckpoint — the connected-components discipline, since a
    ``hops``-deep self-referencing lineage otherwise re-executes earlier
    hops at each action."""
    m_l = metric.lower()
    if m_l not in V.SUPPORTED_METRICS:
        raise ValueError(f"Unknown metric: {metric!r}. Supported: {V.SUPPORTED_METRICS}")
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col).alias("qid"), V.as_double(query_vec_col).alias("qv")
    )
    nodes = df.select(F.col(id_col).alias("id"), V.as_double(vector_col).alias("nv"))
    entries = [int(x) for x in entry_ids]
    seed = q.select("qid").crossJoin(
        nodes.select("id").filter(F.col("id").isin(entries))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    visited = _beam_visited_batch(
        q, nodes, graph, seed, beam, hops, m_l, checkpoint
    )
    return (
        visited.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .select(
            F.col("qid").alias(query_id_col), F.col("id").alias(id_col), "score"
        )
    )


def _beam_visited_batch(
    q: DataFrame,
    nodes: DataFrame,
    graph: DataFrame,
    seed: DataFrame,
    beam: int,
    hops: int,
    metric: str,
    checkpoint: bool,
) -> DataFrame:
    """The batched walk recurrence shared by :func:`graph_beam_search_batch`
    and the batched two-level walk. ``seed`` is an unscored ``(qid, id)``
    frame; state is keyed by (query, node); each hop is ONE equi-join of
    the combined frontier against the edge list + one per-query window —
    job count O(hops), never O(queries·hops). Returns everything visited,
    scored.

    Join-side discipline (the 100 TB shape): the per-hop state frames —
    frontier (≤ queries·beam rows) and candidates (≤ queries·beam·m) —
    are BROADCAST into the joins against the two corpus-sized tables (the
    edge list, the node vectors), so neither ever shuffles: each hop is a
    scan-side hash probe of the persisted/partitioned big table. Without
    the hint Catalyst picked SortMergeJoin for the node-scoring join
    (profiled round 8), re-shuffling every stored VECTOR each hop — ~1 GB
    per hop at 2M×64, unbounded at corpus scale, versus the few-MB
    (qid, id) broadcast. Only the small-tuple bookkeeping (distinct,
    anti-join on (qid, id), the per-query window) shuffles, and those
    rows are bounded by the walk parameters, never the corpus."""
    from pyspark.sql import Window

    edges = graph.select("src", "dst")

    def score(cand: DataFrame) -> DataFrame:
        return (
            nodes.join(F.broadcast(cand), "id")
            .join(q, "qid")
            .select("qid", "id", V.similarity(metric, "nv", "qv").alias("score"))
        )

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False) if checkpoint else df

    # ZERO driver actions inside the walk (round 12; round 11 had cut the
    # per-hop materializations from two to one, 34-108 Spark jobs down to
    # O(hops), ~0.1-0.3 s scheduler+planning overhead apiece at bench
    # scale — guide §1.2, fix the distributed shape first). The hop budget
    # is a FIXED small integer — no driver decision ever depends on a
    # hop's data — so the per-hop checkpoint is LAZY
    # (``localCheckpoint(eager=False)``, the connected-components
    # discipline): each hop's plan is truncated to a LogicalRDD at
    # construction, every consumer (frontier cut, anti-join, union, the
    # final top-k) shares that one RDD, and the whole walk executes as a
    # single job chain under the caller's ONE action instead of one
    # blocking job per hop. ``visited`` carries a ``hop`` tag so the
    # frontier (top-beam of the last hop's rows), the anti-join side and
    # the final result are all cheap reads of the SAME checkpointed
    # frame. Recurrence and tie-breaks are unchanged (parity-pinned +
    # oracle-gated).
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    visited = _ckpt(score(seed).withColumn("hop", F.lit(0)))
    for h in range(1, hops + 1):
        frontier = visited.filter(F.col("hop") == h - 1)
        if h > 1:
            frontier = (
                frontier.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= beam)
                .drop("rn")
            )
        cand = (
            edges.join(
                F.broadcast(frontier.select("qid", F.col("id").alias("src"))),
                "src",
            )
            .select("qid", F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("qid", "id"), ["qid", "id"], "left_anti")
        )
        visited = _ckpt(
            visited.unionByName(score(cand).withColumn("hop", F.lit(h)))
        )
    return visited.drop("hop")


def graph_cells_route_search_batch(
    graph: DataFrame,
    cells: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    seeds_per_cell: int = 2,
    beam: int = 8,
    hops: int = 2,
    id_col: str = "vec_id",
    vector_col: str = "v",
    centroid_id_col: str = "centroid_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    metric: str = "cosine",
    checkpoint: bool = True,
) -> DataFrame:
    """CENTROID-ROUTED batch graph walk — coarse quantizer routes, graph
    polishes. The round-9 structured-corpus forensics
    (STRUCTURED_RECALL_2M.json): on clustered data :func:`knn_graph_cells`
    builds a near-perfect kNN graph (edge capture 0.999 at 2M) but a pure
    kNN graph is a DISJOINT union of per-cluster components — hub-entry
    walks stall in whatever clusters the entries live in (recall 0.07).
    hnswlib solves connectivity with long-range links from its insertion
    order + layer hierarchy (reference src/vectordb/ann.py builds on it);
    the batch-Spark solution is to route each query through the SAME
    coarse structure the build used: rank the broadcast centroids per
    query (the IVF probe rule — euclidean, ties to lowest cid), seed the
    walk with ``seeds_per_cell`` lowest-id members of each of the
    ``nprobe`` nearest cells, and let the in-cluster kNN edges do the
    refinement brute-force probing would pay a full cell scan for.

    Scale shape: routing is a Q×K broadcast cross (K = cell count, driver-
    bounded like every centroid frame); seed selection is one window over
    the probed members' (qid, cell, id) TUPLES — no vector is shuffled or
    scored until the walk scores its visited set, so rows-touched per
    query is seeds + O(beam·m·hops), independent of cell populations
    (contrast: IVF serving scores every row of every probed cell). The
    walk itself is :func:`_beam_visited_batch` — state frames broadcast,
    corpus never re-shuffled. Deterministic end to end, so the whole
    serve is SQL-oracle-checkable. Returns (query_id, id, score) top-k."""
    m_l = metric.lower()
    if m_l not in V.SUPPORTED_METRICS:
        raise ValueError(
            f"Unknown metric: {metric!r}. Supported: {V.SUPPORTED_METRICS}"
        )
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col).alias("qid"),
        V.as_double(query_vec_col).alias("qv"),
    )
    nodes = cells.select(
        F.col(id_col).alias("id"), V.as_double(vector_col).alias("nv")
    )
    cents = centroids.select(
        F.col(centroid_id_col).cast("int").alias("cid"),
        V.as_double("centroid").alias("cv"),
    )
    w_route = Window.partitionBy("qid").orderBy(
        F.col("cdist").asc(), F.col("cid").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "qid", "cid",
            V.euclidean_distance(F.col("qv"), F.col("cv")).alias("cdist"),
        )
        .withColumn("rn", F.row_number().over(w_route))
        .filter(F.col("rn") <= int(nprobe))
        .select("qid", "cid")
    )
    memb = cells.select(
        F.col(id_col).alias("id"),
        F.col(centroid_id_col).cast("int").alias("cid"),
    )
    w_seed = Window.partitionBy("qid", "cid").orderBy(F.col("id").asc())
    seeds = (
        memb.join(F.broadcast(probes), "cid")
        .withColumn("rn", F.row_number().over(w_seed))
        .filter(F.col("rn") <= int(seeds_per_cell))
        .select("qid", "id")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    visited = _beam_visited_batch(
        q, nodes, graph, seeds, beam, hops, m_l, checkpoint
    )
    return (
        visited.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .select(
            F.col("qid").alias(query_id_col),
            F.col("id").alias(id_col),
            "score",
        )
    )


def graph_two_level_search_batch(
    upper_graph: DataFrame,
    lower_graph: DataFrame,
    df: DataFrame,
    queries: DataFrame,
    upper_entry_ids: Sequence[int],
    beam_up: int = 8,
    hops_up: int = 2,
    n_descend: int = 4,
    beam: int = 8,
    hops: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    metric: str = "cosine",
    checkpoint: bool = True,
) -> DataFrame:
    """Batched :func:`graph_two_level_search`: N queries descend the
    hierarchy SIMULTANEOUSLY — upper walk, per-query top-``n_descend``
    descent cut (one window), lower walk — with job count O(hops_up +
    hops), never O(queries). Per-query recurrence and tie-breaks are
    identical to the single-query function (parity-tested). Returns
    ``(query_id, id_col, score)`` top-k per query."""
    m_l = metric.lower()
    if m_l not in V.SUPPORTED_METRICS:
        raise ValueError(f"Unknown metric: {metric!r}. Supported: {V.SUPPORTED_METRICS}")
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col).alias("qid"), V.as_double(query_vec_col).alias("qv")
    )
    nodes = df.select(F.col(id_col).alias("id"), V.as_double(vector_col).alias("nv"))
    entries = [int(x) for x in upper_entry_ids]
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    if not entries:
        # Degenerate upper layer (tiny corpus: the ~1/level_mult hash sample
        # yields an edge-less upper graph whose hub list is empty). Seed the
        # LOWER walk from the lower graph's own hubs instead of silently
        # returning zero rows.
        entries = graph_hub_entries(lower_graph, n_entries=max(1, int(n_descend)))
        if not entries:
            # Lower graph edge-less too: brute-force every query against
            # the (degenerate-tiny) corpus rather than return zero rows.
            scored = q.crossJoin(nodes).select(
                "qid", "id",
                V.similarity(m_l, F.col("nv"), F.col("qv")).alias("score"),
            )
            return (
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k)
                .drop("rn")
                .select(
                    F.col("qid").alias(query_id_col),
                    F.col("id").alias(id_col), "score",
                )
            )
        seeds = q.select("qid").crossJoin(
            nodes.select("id").filter(F.col("id").isin(entries))
        )
    else:
        seed_up = q.select("qid").crossJoin(
            nodes.select("id").filter(F.col("id").isin(entries))
        )
        v_up = _beam_visited_batch(
            q, nodes, upper_graph, seed_up, beam_up, hops_up, m_l, checkpoint
        )
        seeds = (
            v_up.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= int(n_descend))
            .select("qid", "id")
        )
    visited = _beam_visited_batch(
        q, nodes, lower_graph, seeds, beam, hops, m_l, checkpoint
    )
    return (
        visited.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .select(
            F.col("qid").alias(query_id_col), F.col("id").alias(id_col), "score"
        )
    )


def graph_beam_search(
    graph: DataFrame,
    df: DataFrame,
    query_vector: Sequence[float],
    entry_ids: Sequence[int],
    beam: int = 8,
    hops: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Greedy beam search over a :func:`knn_graph` — the batch analog of
    HNSW's ``knn_query`` graph walk (reference src/vectordb/ann.py:93-102;
    ``beam`` plays ``ef_search``). Deterministic recurrence, mirrored
    exactly by the SQL oracle:

        frontier_0 = entry_ids (scored)
        cand_h     = distinct neighbors(frontier_{h-1}) - visited_{h-1}
        visited_h  = visited_{h-1} ∪ cand_h
        frontier_h = top-``beam`` of cand_h   (score DESC, id ASC)
        result     = top-``k`` of visited_hops

    Each hop is ONE equi-join against the (persisted) edge list + one
    TakeOrdered — per-hop cost tracks the frontier×m fan-out, never the
    corpus. ``hops`` is a fixed small integer (the walk depth), so the
    driver-side loop is bounded and the lineage stays flat via
    localCheckpoint — the connected-components pattern."""
    m_l = metric.lower()
    qv = V.vector_literal([float(x) for x in query_vector])
    scored_nodes = df.select(
        F.col(id_col).alias("id"),
        V.similarity(m_l, V.as_double(vector_col), qv).alias("score"),
    )
    entries = [int(x) for x in entry_ids]
    seed = scored_nodes.filter(F.col("id").isin(entries))
    visited = _beam_visited(scored_nodes, graph, seed, beam, hops)
    return visited.orderBy(F.desc("score"), F.asc("id")).limit(k).select(
        F.col("id").alias(id_col), "score"
    )


def _beam_visited(
    scored_nodes: DataFrame, graph: DataFrame, seed: DataFrame,
    beam: int, hops: int,
) -> DataFrame:
    """The beam-walk recurrence shared by :func:`graph_beam_search` and the
    two-level walk: ``visited`` starts at the scored ``seed`` rows, each hop
    expands the frontier's out-edges (one equi-join against the edge list),
    scores only the unvisited ids, and keeps the per-hop top-``beam`` as the
    next frontier. Returns everything visited. ``hops`` is a fixed small
    integer; lineage stays flat via localCheckpoint. The frontier/candidate
    id sets are BROADCAST into the joins against the edge list and the
    scored corpus (same discipline as the batch form): the corpus-sized
    sides never shuffle — each hop is a scan-side hash probe."""
    # ZERO driver actions inside the walk — the batch kernel's hop-tagged
    # LAZY-checkpoint discipline (see _beam_visited_batch): the hop budget
    # is fixed, no driver decision reads a hop's data, so every per-hop
    # checkpoint is ``localCheckpoint(eager=False)`` — lineage truncated
    # at construction, one shared RDD per hop, the whole walk runs under
    # the caller's single action instead of one blocking job per hop
    # (round 11 had already cut 34-108 jobs per walk row to O(hops); this
    # removes the remaining O(hops) scheduler round-trips). The frontier,
    # the anti-join side and the result all read the SAME checkpointed
    # frame; recurrence and tie-breaks unchanged.
    edges = graph.select("src", "dst")
    visited = seed.withColumn("hop", F.lit(0)).localCheckpoint(eager=False)
    for h in range(1, hops + 1):
        frontier = visited.filter(F.col("hop") == h - 1)
        if h > 1:
            frontier = frontier.orderBy(F.desc("score"), F.asc("id")).limit(beam)
        cand_ids = (
            edges.join(
                F.broadcast(frontier.select(F.col("id").alias("src"))), "src"
            )
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
        )
        cand = scored_nodes.join(F.broadcast(cand_ids), "id")
        visited = visited.unionByName(
            cand.withColumn("hop", F.lit(h))
        ).localCheckpoint(eager=False)
    return visited.drop("hop")


def upper_layer(
    df: DataFrame,
    level_mult: int = 16,
    id_col: str = "vec_id",
    salt: str = "hnsw_upper",
) -> DataFrame:
    """The coarse layer's node set: a deterministic ~1/``level_mult``
    hash-sample of the corpus — HNSW's geometric level assignment
    (reference src/vectordb/ann.py:21-65 via hnswlib: node level ~
    Geometric(1/level_mult), so layer 1 holds ~n/level_mult nodes) with the
    repo's cross-engine md5 membership predicate (operators/sample.py
    ``hash_fraction_sample``) instead of RNG state, so the layer is
    bit-reproducible on any engine and any partitioning. Pure scan-side
    filter — no shuffle, no count."""
    from .sample import hash_fraction_sample

    return hash_fraction_sample(df, id_col, 1.0 / int(level_mult), salt=salt)


def graph_two_level_search(
    upper_graph: DataFrame,
    lower_graph: DataFrame,
    df: DataFrame,
    query_vector: Sequence[float],
    upper_entry_ids: Sequence[int],
    beam_up: int = 8,
    hops_up: int = 2,
    n_descend: int = 4,
    beam: int = 8,
    hops: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Coarse-to-fine graph walk — HNSW's layered descent (reference
    src/vectordb/ann.py:21-65: search the top layer to a local optimum,
    then descend and search layer 0 from there) in batch form, breaking the
    FLAT graph's degree law (:func:`graph_params_for`: m doubles per 10×
    corpus to stay navigable from far-away entries). Here navigability
    comes from the hierarchy instead: walk the ``upper_graph`` (built over
    the ~n/level_mult :func:`upper_layer` sample with CONSTANT m) from its
    hub entries, take the ``n_descend`` best visited nodes — upper nodes
    ARE corpus nodes, so they are valid lower entries — and walk the
    ``lower_graph`` (full corpus, same constant m) from those
    already-near-the-query seeds with a SHORT fixed hop budget.

    Cost shape at 100 TB: the upper walk touches
    O(hops_up · beam_up · m) rows of an edge list 1/level_mult the corpus
    size; the lower walk touches O(hops · beam · m) — both independent of
    n, and both layers keep m constant, so total edge storage is
    n·m·(1 + 1/level_mult) instead of the flat graph's n·m(n). Every stage
    (hub selection, both walks, the descent top-``n_descend``) is a
    deterministic recurrence (score DESC, id ASC), so the whole two-level
    pipeline is hop-unrollable and hash-checkable in SQL.

    Measured at 200k×64 (BASELINE.md round-7 table): at EQUAL edge budget
    the hierarchy matches the flat graph on iid data (recall 0.923 vs
    0.918) and reaches within 0.06 of the law-degree flat graph at HALF
    its edges; on a duplicate-heavy corpus it is the difference between
    working and broken (0.89 vs 0.000-0.004 at ANY flat degree — the
    hash-sampled upper layer thins clone clusters, so hub entries stay
    navigable). Returns ``(id_col, score)`` top-k."""
    m_l = metric.lower()
    if m_l not in V.SUPPORTED_METRICS:
        raise ValueError(f"Unknown metric: {metric!r}. Supported: {V.SUPPORTED_METRICS}")
    qv = V.vector_literal([float(x) for x in query_vector])
    scored_nodes = df.select(
        F.col(id_col).alias("id"),
        V.similarity(m_l, V.as_double(vector_col), qv).alias("score"),
    )
    entries = [int(x) for x in upper_entry_ids]
    if not entries:
        # Degenerate upper layer (tiny corpus: the ~1/level_mult hash sample
        # yields an edge-less upper graph whose hub list is empty). Seed the
        # LOWER walk from the lower graph's own hubs instead of silently
        # returning zero rows.
        entries = graph_hub_entries(lower_graph, n_entries=max(1, int(n_descend)))
        if not entries:
            # Lower graph edge-less too (single-node / fully-disconnected
            # corpus): no walk can reach anything, so honour the
            # never-zero-rows contract with an exact brute-force top-k —
            # the corpus is degenerate-tiny by construction here.
            return (
                scored_nodes.orderBy(F.desc("score"), F.asc("id"))
                .limit(k)
                .select(F.col("id").alias(id_col), "score")
            )
        # no pre-checkpoint: _beam_visited checkpoints its hop-0 frame
        seeds = scored_nodes.filter(F.col("id").isin(entries))
    else:
        seed_up = scored_nodes.filter(F.col("id").isin(entries))
        v_up = _beam_visited(scored_nodes, upper_graph, seed_up, beam_up, hops_up)
        # v_up is ONE checkpointed frame, so the descent cut is a cheap
        # lazy read — no extra materialization before the lower walk
        seeds = v_up.orderBy(F.desc("score"), F.asc("id")).limit(int(n_descend))
    visited = _beam_visited(scored_nodes, lower_graph, seeds, beam, hops)
    return visited.orderBy(F.desc("score"), F.asc("id")).limit(k).select(
        F.col("id").alias(id_col), "score"
    )


def graph_hub_entries(graph: DataFrame, n_entries: int = 4) -> list[int]:
    """Walk entry selection FROM THE GRAPH ITSELF: the ``n_entries``
    highest in-degree nodes (ties -> lowest id). The flat-graph analog of
    HNSW's top-layer entry point (reference src/vectordb/ann.py:93-102
    descends from the maintained entry): high in-degree nodes are the
    hubs many neighborhoods point AT, so a walk from them reaches any
    region in few hops. One groupBy over the edge list + a driver-side
    top-N of O(nodes) counts — deterministic and SQL-replicable (the
    disk-roundtrip gate checks it)."""
    rows = (
        graph.groupBy("dst")
        .count()
        .orderBy(F.desc("count"), F.asc("dst"))
        .limit(n_entries)
        .collect()
    )
    return [int(r.dst) for r in rows]


class GraphIndex:
    """Cached batch GRAPH index with the same lazy-maintenance lifecycle as
    :class:`IVFIndex` — the Spark orchestration of the reference's HNSW
    (ref api.py:42-79: ``_maybe_init_ann`` rebuilds when sizes drift,
    inserts incrementally when the index exists; ann.py:78-91 resize+add):

    - ``build(df)`` — :func:`knn_graph` over the corpus, persisted.
    - ``ensure(df)`` — no-op when fresh; PURE APPENDS (every indexed id
      still present, content fingerprint unchanged) fold in via
      :func:`knn_graph_incremental` (bit-identical to a rebuild — the
      top-M merge theorem); any other drift rebuilds.
    - ``query(df, qv)`` — :func:`graph_beam_search` from hub entries
      (:func:`graph_hub_entries`), walk params defaulting to the measured
      degree law (:func:`graph_params_for`).
    - ``save``/``load`` — edge-list parquet + JSON sidecar (plane seeds,
      m, metric, indexed size, hub entries). Loading serves walks straight
      off the table: each hop is an equi-join against it, no rebuild.
    """

    SIDECAR = "_graph_index.json"

    def __init__(
        self,
        n_plane_sets: int = 4,
        n_planes: int = 4,
        m: int = 16,
        metric: str = "cosine",
        id_col: str = "vec_id",
        vector_col: str = "embedding",
        seed: int = LSH_SEED,
        blocks_per_bucket: int | None = None,
        row_cap: int = 4096,
        refine_rounds: int = 0,
        refine_expand: int = 8,
        sym_m_rev: int = 0,
        build_waves: int | None = None,
        build_dir: str | None = None,
    ):
        self.n_plane_sets = n_plane_sets
        self.n_planes = n_planes
        self.m = m
        self.metric = metric
        self.id_col = id_col
        self.vector_col = vector_col
        self.seed = seed
        self.blocks_per_bucket = blocks_per_bucket
        self.row_cap = row_cap
        # Bounded-spill build (VERDICT r9 #4): with build_waves > 1 the
        # edge build runs wave-at-a-time through _waved_edge_build,
        # checkpointing per-wave deltas under build_dir — identical edges,
        # in-flight shuffle O(corpus/waves). build_dir must outlive the
        # index (the persisted edge frame recomputes from it on eviction).
        self.build_waves = build_waves
        self.build_dir = build_dir
        # NN-descent rounds applied after each BUILD (knn_graph_refine —
        # the round-9 recall lever at 2M+). The pure-append fold-in path
        # stays refine-free BY DESIGN: its bit-equal-to-rebuild theorem
        # assumes old edges are the LSH candidates' top-M; refined edges
        # are a superset-quality graph, so after a fold-in the graph stays
        # monotone-good but is not bit-equal to a refined rebuild — callers
        # wanting that invariant rebuild (the gated incremental row pins
        # refine_rounds=0).
        self.refine_rounds = int(refine_rounds)
        self.refine_expand = int(refine_expand)
        # Degree-capped bidirectional links applied after each BUILD
        # (symmetrize_edges — HNSW's reverse-link insertion in batch form).
        # Like refine_rounds, this voids the fold-in bit-equal theorem —
        # worse, re-topping a symmetrized union to m would DROP reverse
        # edges — so with sym_m_rev > 0 any size drift rebuilds (ensure
        # guards on it; HNSW-analog maintenance is amortized-rebuild here).
        self.sym_m_rev = int(sym_m_rev)
        self._edges: DataFrame | None = None
        self._indexed_rows = -1
        self._entries: list[int] | None = None
        self._dim: int | None = None
        self._corpus_fp: int | None = None

    def _plane_sets(self, dim: int) -> list[list[list[float]]]:
        return [
            hyperplanes(dim, self.n_planes, seed=self.seed + r)
            for r in range(self.n_plane_sets)
        ]

    def _infer_dim(self, df: DataFrame) -> int:
        if self._dim is None:
            self._dim = len(df.select(self.vector_col).head()[0])
        return self._dim

    def build(self, df: DataFrame) -> "GraphIndex":
        self.invalidate()
        if df.head(1) == []:
            # Empty corpus (e.g. a tiny corpus's ~1/level_mult upper sample):
            # a valid edge-less index — entries() returns [] and callers
            # (TwoLevelGraphIndex.query) route around it rather than crash.
            edges = df.sparkSession.createDataFrame(
                [], "src bigint, dst bigint, score double"
            ).persist()
            edges.count()
            self._edges = edges
            self._indexed_rows = 0
            self._entries = None
            self._corpus_fp = 0
            return self
        dim = self._infer_dim(df)
        edges = knn_graph(
            df,
            self._plane_sets(dim),
            m=self.m,
            id_col=self.id_col,
            vector_col=self.vector_col,
            metric=self.metric,
            blocks_per_bucket=self.blocks_per_bucket,
            row_cap=self.row_cap,
            n_waves=self.build_waves,
            work_dir=self.build_dir,
        )
        inters = []
        for _ in range(self.refine_rounds):
            prev = edges.persist()
            prev.count()
            inters.append(prev)
            edges = knn_graph_refine(
                prev, df, m=self.m, expand=self.refine_expand,
                id_col=self.id_col, vector_col=self.vector_col,
                metric=self.metric,
            )
        if self.sym_m_rev > 0:
            edges = symmetrize_edges(edges, m_rev=self.sym_m_rev)
        edges = edges.persist()
        edges.count()
        for p in inters:
            p.unpersist()
        self._edges = edges
        self._indexed_rows = df.count()
        self._entries = None
        self._corpus_fp = corpus_fingerprint(df, self.id_col, self.vector_col)
        return self

    def invalidate(self) -> None:
        if self._edges is not None:
            self._edges.unpersist()
        self._edges = None
        self._indexed_rows = -1
        self._entries = None
        self._corpus_fp = None

    def is_stale(self, df: DataFrame) -> bool:
        return self._edges is None or df.count() != self._indexed_rows

    def ensure(self, df: DataFrame) -> "GraphIndex":
        """Lazy maintenance: fresh -> no-op; pure append -> one-sided
        incremental fold-in (EXACT, not approximate); other drift ->
        rebuild. Same reconciliation protocol as IVFIndex.ensure: anti-join
        on the id column + an (id, vector) content fingerprint over the
        overlapping rows. The edge list doesn't carry the raw vectors, so
        the build-time corpus fingerprint is cached as a scalar (and
        persisted in the sidecar); the overlap in the NEW df is digested
        and compared against it — an in-place vector update combined with
        an append therefore cannot be misclassified as a pure append (it
        would merge old edges scored on stale vectors). Contract bound
        (same as IVFIndex / the reference's size-only check,
        src/vectordb/api.py:63-79): a count-preserving pure in-place
        rewrite with NO appends needs an explicit :meth:`invalidate`."""
        if self._edges is None or self._indexed_rows == 0:
            return self.build(df)
        n = df.count()
        if n == self._indexed_rows:
            return self
        indexed_ids = self._edges.select(F.col("src").alias(self.id_col)).distinct()
        delta = df.join(indexed_ids, self.id_col, "left_anti")
        corpus = df.join(indexed_ids, self.id_col, "left_semi")
        if (
            self.sym_m_rev == 0
            and corpus.count() == self._indexed_rows
            and delta.count() == n - self._indexed_rows
            and self._corpus_fp is not None
            and corpus_fingerprint(corpus, self.id_col, self.vector_col)
            == self._corpus_fp
        ):
            dim = self._infer_dim(df)
            merged = knn_graph_incremental(
                self._edges,
                corpus,
                delta,
                self._plane_sets(dim),
                m=self.m,
                id_col=self.id_col,
                vector_col=self.vector_col,
                metric=self.metric,
                blocks_per_bucket=self.blocks_per_bucket,
                row_cap=self.row_cap,
            ).persist()
            merged.count()
            old = self._edges
            self._edges = merged
            old.unpersist()
            self._indexed_rows = n
            self._entries = None
            self._corpus_fp ^= corpus_fingerprint(
                delta, self.id_col, self.vector_col
            )
            return self
        return self.build(df)

    def entries(self, n_entries: int = 4) -> list[int]:
        if self._edges is None:
            raise ValueError("entries() requires a built index")
        if self._entries is None or len(self._entries) != n_entries:
            self._entries = graph_hub_entries(self._edges, n_entries)
        return self._entries

    def query(
        self,
        df: DataFrame,
        query_vector: Sequence[float],
        k: int = 5,
        beam: int | None = None,
        hops: int | None = None,
        n_entries: int = 4,
        assume_fresh: bool = False,
    ) -> DataFrame:
        if not assume_fresh or self._edges is None:
            self.ensure(df)
        p = graph_params_for(self._indexed_rows)
        walk_entries = self.entries(n_entries)
        if not walk_entries:
            # Edge-less graph (single-row corpus): exact brute-force top-k —
            # the reference's graceful ANN fallback, never zero rows.
            from . import knn as K

            return K.knn(
                df, query_vector, k=k, metric=self.metric,
                vector_col=self.vector_col, id_col=self.id_col,
            )
        return graph_beam_search(
            self._edges,
            df,
            query_vector,
            walk_entries,
            beam=beam if beam is not None else p["beam"],
            hops=hops if hops is not None else p["hops"],
            k=k,
            id_col=self.id_col,
            vector_col=self.vector_col,
            metric=self.metric,
        )

    def query_batch(
        self,
        df: DataFrame,
        queries: DataFrame,
        k: int = 5,
        beam: int | None = None,
        hops: int | None = None,
        n_entries: int = 4,
        assume_fresh: bool = False,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
    ) -> DataFrame:
        """Batched walk over the cached graph — N queries in ONE plan
        (:func:`graph_beam_search_batch`), per-query results identical to
        :meth:`query` (shared recurrence, parity-tested); same freshness
        contract and edge-less brute fallback."""
        if not assume_fresh or self._edges is None:
            self.ensure(df)
        p = graph_params_for(self._indexed_rows)
        walk_entries = self.entries(n_entries)
        if not walk_entries:
            return K.knn_join(
                df, queries, k=k, metric=self.metric,
                vector_col=self.vector_col, id_col=self.id_col,
                query_vector_col=query_vec_col, query_id_col=query_id_col,
            ).select(query_id_col, self.id_col, "score")
        return graph_beam_search_batch(
            self._edges,
            df,
            queries,
            walk_entries,
            beam=beam if beam is not None else p["beam"],
            hops=hops if hops is not None else p["hops"],
            k=k,
            id_col=self.id_col,
            vector_col=self.vector_col,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            metric=self.metric,
        )

    def save(self, path: str) -> "GraphIndex":
        if self._edges is None:
            raise ValueError("index not built; call build()/ensure() first")
        self._edges.write.mode("overwrite").parquet(path)
        sidecar = {
            "n_plane_sets": self.n_plane_sets,
            "n_planes": self.n_planes,
            "m": self.m,
            "metric": self.metric,
            "id_col": self.id_col,
            "vector_col": self.vector_col,
            "seed": self.seed,
            "blocks_per_bucket": self.blocks_per_bucket,
            "row_cap": self.row_cap,
            "refine_rounds": self.refine_rounds,
            "refine_expand": self.refine_expand,
            "sym_m_rev": self.sym_m_rev,
            "indexed_rows": self._indexed_rows,
            "dim": self._dim,
            "corpus_fp": self._corpus_fp,
        }
        with open(os.path.join(path, self.SIDECAR), "w", encoding="utf-8") as f:
            json.dump(sidecar, f)
        return self

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "GraphIndex":
        with open(os.path.join(path, cls.SIDECAR), encoding="utf-8") as f:
            meta = json.load(f)
        idx = cls(
            n_plane_sets=int(meta["n_plane_sets"]),
            n_planes=int(meta["n_planes"]),
            m=int(meta["m"]),
            metric=meta["metric"],
            id_col=meta["id_col"],
            vector_col=meta["vector_col"],
            seed=int(meta["seed"]),
            blocks_per_bucket=(
                int(meta["blocks_per_bucket"])
                if meta.get("blocks_per_bucket") is not None
                else None
            ),
            row_cap=int(meta.get("row_cap", 4096)),
            refine_rounds=int(meta.get("refine_rounds", 0)),
            refine_expand=int(meta.get("refine_expand", 8)),
            sym_m_rev=int(meta.get("sym_m_rev", 0)),
        )
        idx._edges = spark.read.parquet(path)
        idx._indexed_rows = int(meta["indexed_rows"])
        idx._dim = int(meta["dim"]) if meta.get("dim") is not None else None
        fp = meta.get("corpus_fp")
        idx._corpus_fp = int(fp) if fp is not None else None
        return idx


class TwoLevelGraphIndex:
    """Cached two-level (coarse-to-fine) graph index — the HNSW hierarchy
    (reference src/vectordb/ann.py:21-65 via hnswlib: layered graphs,
    geometric level assignment, descend-then-refine ``knn_query``) as a
    COMPOSITION of two :class:`GraphIndex` layers: the lower layer over the
    full corpus, the upper over the deterministic :func:`upper_layer`
    md5-hash sample (~1/level_mult of the rows — upper nodes ARE corpus
    nodes, exactly hnswlib's membership rule). Lifecycle verbs mirror the
    reference's lazy orchestration: ``ensure`` reconciles EACH layer
    independently through GraphIndex.ensure (pure append -> one-sided
    fold-in per layer, where the upper delta is ``upper_layer(delta)`` —
    the hash predicate is stable, so a corpus append can only APPEND to
    the upper layer; content drift -> that layer rebuilds); ``query``
    walks upper-hub entries -> descent -> short lower walk
    (:func:`graph_two_level_search`). Serving rationale: BASELINE.md
    round-7 table — recall parity with the flat graph at equal edge
    budget on iid data, 0.89-vs-0.000 on the duplicate-heavy clone
    corpus, half the law-degree edge storage."""

    META = "_two_level_meta.json"

    def __init__(
        self,
        level_mult: int = 16,
        m_lower: int = 16,
        m_upper: int = 16,
        n_plane_sets: int = 4,
        n_planes: int = 4,
        metric: str = "cosine",
        id_col: str = "vec_id",
        vector_col: str = "embedding",
        seed: int = LSH_SEED,
        salt: str = "hnsw_upper",
        row_cap: int = 4096,
        refine_rounds: int = 0,
        refine_expand: int = 8,
        sym_m_rev: int = 0,
    ):
        self.level_mult = int(level_mult)
        self.salt = salt
        kw = dict(
            n_plane_sets=n_plane_sets, n_planes=n_planes, metric=metric,
            id_col=id_col, vector_col=vector_col, seed=seed, row_cap=row_cap,
            refine_rounds=refine_rounds, refine_expand=refine_expand,
            sym_m_rev=sym_m_rev,
        )
        self.lower = GraphIndex(m=m_lower, **kw)
        self.upper = GraphIndex(m=m_upper, **kw)
        self.id_col = id_col
        self.vector_col = vector_col
        self.metric = metric

    def _upper_df(self, df: DataFrame) -> DataFrame:
        return upper_layer(
            df, self.level_mult, id_col=self.id_col, salt=self.salt
        )

    def build(self, df: DataFrame) -> "TwoLevelGraphIndex":
        self.lower.build(df)
        self.upper.build(self._upper_df(df))
        return self

    def invalidate(self) -> None:
        self.lower.invalidate()
        self.upper.invalidate()

    def is_stale(self, df: DataFrame) -> bool:
        return self.lower.is_stale(df) or self.upper.is_stale(
            self._upper_df(df)
        )

    def ensure(self, df: DataFrame) -> "TwoLevelGraphIndex":
        self.lower.ensure(df)
        self.upper.ensure(self._upper_df(df))
        return self

    def query(
        self,
        df: DataFrame,
        query_vector: Sequence[float],
        k: int = 5,
        beam_up: int | None = None,
        hops_up: int | None = None,
        n_descend: int = 4,
        beam: int | None = None,
        hops: int | None = None,
        n_entries: int = 4,
        assume_fresh: bool = False,
    ) -> DataFrame:
        if (
            not assume_fresh
            or self.lower._edges is None
            or self.upper._edges is None
        ):
            self.ensure(df)
        p_up = graph_params_for(max(2, self.upper._indexed_rows))
        p_lo = graph_params_for(max(2, self.lower._indexed_rows))
        upper_entries = self.upper.entries(n_entries)
        if not upper_entries:
            # Tiny corpus: the ~1/level_mult upper sample produced an
            # edge-less graph (no hubs). Serve through the FLAT lower walk
            # from the lower graph's own hubs with the full hop budget —
            # never silently return zero rows for a valid query.
            lower_entries = self.lower.entries(n_entries)
            if not lower_entries:
                # Even the lower graph is edge-less (single-row corpus):
                # exact brute-force top-k, the reference's graceful ANN
                # fallback (src/vectordb/api.py:152-205 analog).
                from . import knn as K

                return K.knn(
                    df, query_vector, k=k, metric=self.metric,
                    vector_col=self.vector_col, id_col=self.id_col,
                )
            return graph_beam_search(
                self.lower._edges,
                df,
                query_vector,
                lower_entries,
                beam=beam if beam is not None else p_lo["beam"],
                hops=hops if hops is not None else p_lo["hops"],
                k=k,
                id_col=self.id_col,
                vector_col=self.vector_col,
                metric=self.metric,
            )
        return graph_two_level_search(
            self.upper._edges,
            self.lower._edges,
            df,
            query_vector,
            upper_entries,
            beam_up=beam_up if beam_up is not None else p_up["beam"],
            hops_up=hops_up if hops_up is not None else p_up["hops"],
            n_descend=n_descend,
            beam=beam if beam is not None else p_lo["beam"],
            # seeds start NEAR the query, so the lower walk refines with
            # roughly half the flat walk's hop budget
            hops=hops if hops is not None else max(2, p_lo["hops"] // 2),
            k=k,
            id_col=self.id_col,
            vector_col=self.vector_col,
            metric=self.metric,
        )

    def query_batch(
        self,
        df: DataFrame,
        queries: DataFrame,
        k: int = 5,
        beam_up: int | None = None,
        hops_up: int | None = None,
        n_descend: int = 4,
        beam: int | None = None,
        hops: int | None = None,
        n_entries: int = 4,
        assume_fresh: bool = False,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
    ) -> DataFrame:
        """Batched hierarchical descent — N queries in ONE plan
        (:func:`graph_two_level_search_batch`, which also owns the
        degenerate-layer fallbacks); same freshness contract and law-degree
        walk defaults as :meth:`query`."""
        if (
            not assume_fresh
            or self.lower._edges is None
            or self.upper._edges is None
        ):
            self.ensure(df)
        p_up = graph_params_for(max(2, self.upper._indexed_rows))
        p_lo = graph_params_for(max(2, self.lower._indexed_rows))
        return graph_two_level_search_batch(
            self.upper._edges,
            self.lower._edges,
            df,
            queries,
            self.upper.entries(n_entries),
            beam_up=beam_up if beam_up is not None else p_up["beam"],
            hops_up=hops_up if hops_up is not None else p_up["hops"],
            n_descend=n_descend,
            beam=beam if beam is not None else p_lo["beam"],
            hops=hops if hops is not None else max(2, p_lo["hops"] // 2),
            k=k,
            id_col=self.id_col,
            vector_col=self.vector_col,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            metric=self.metric,
        )

    def save(self, path: str) -> "TwoLevelGraphIndex":
        if self.lower._edges is None or self.upper._edges is None:
            raise ValueError("index not built; call build()/ensure() first")
        os.makedirs(path, exist_ok=True)
        self.lower.save(os.path.join(path, "_lower"))
        self.upper.save(os.path.join(path, "_upper"))
        meta = {"level_mult": self.level_mult, "salt": self.salt}
        with open(os.path.join(path, self.META), "w", encoding="utf-8") as f:
            json.dump(meta, f)
        return self

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "TwoLevelGraphIndex":
        with open(os.path.join(path, cls.META), encoding="utf-8") as f:
            meta = json.load(f)
        lower = GraphIndex.load(spark, os.path.join(path, "_lower"))
        upper = GraphIndex.load(spark, os.path.join(path, "_upper"))
        idx = cls(
            level_mult=int(meta["level_mult"]),
            m_lower=lower.m,
            m_upper=upper.m,
            n_plane_sets=lower.n_plane_sets,
            n_planes=lower.n_planes,
            metric=lower.metric,
            id_col=lower.id_col,
            vector_col=lower.vector_col,
            seed=lower.seed,
            salt=meta.get("salt", "hnsw_upper"),
            row_cap=lower.row_cap,
            refine_rounds=lower.refine_rounds,
            refine_expand=lower.refine_expand,
            sym_m_rev=lower.sym_m_rev,
        )
        idx.lower = lower
        idx.upper = upper
        return idx


def ann_distance_to_similarity(dist: Column, metric: str = "euclidean") -> Column:
    """Distance→similarity conversion for ANN results (≙ reference
    src/vectordb/api.py:81-91 ``_convert_ann_distances_to_similarity``):
    cosine-space indexes return ``1 - d``; everything else ``1/(1+d)``.
    A pure Column expression — applied to an ANN join/probe output it stays
    inside codegen. The gated query (``neardup_brp_similarity``) derives the
    score from the micro-ROUNDED integer distance instead, because MLlib's
    float distance and the oracle's agree only to ~1 ulp — the float form
    here is the runtime API, the integer form is the cross-engine gate."""
    if metric == "cosine":
        return F.lit(1.0) - dist
    return F.lit(1.0) / (F.lit(1.0) + dist)


def _make_block_threshold_dist_kernel(thr: float):
    """mapInPandas kernel over (same, rows_a, rows_b) block pairs emitting
    every pair with euclidean distance strictly UNDER ``thr`` as
    ``(id_a < id_b, dist)``. Distance accumulates dimension-by-dimension in
    the exact IEEE fold order of the SQL oracle's ``list_distance`` (the
    :func:`_make_block_scorer` discipline), so ``dist`` micro-rounds
    identically across engines."""

    def dist_blocks(batches):
        import numpy as np
        import pandas as pd

        def unpack(rows):
            ids = np.fromiter(
                (r["id"] for r in rows), dtype=np.int64, count=len(rows)
            )
            mat = np.array([r["v"] for r in rows], dtype=np.float64)
            return ids, mat

        for pdf in batches:
            out_a, out_b, out_d = [], [], []
            for same, ra, rb in zip(pdf["same"], pdf["rows_a"], pdf["rows_b"]):
                ids_a, A = unpack(ra)
                ids_b, B = (ids_a, A) if same else unpack(rb)
                acc = np.zeros((len(A), len(B)))
                for i in range(A.shape[1]):  # exact fold order, no BLAS
                    d = np.subtract.outer(A[:, i], B[:, i])
                    acc = acc + d * d
                dist = np.sqrt(acc)
                lo = (
                    ids_a[:, None] < ids_b[None, :]
                    if same
                    else np.ones_like(dist, bool)
                )
                ii, jj = np.nonzero((dist < thr) & lo)
                pa, pb, pd_ = ids_a[ii], ids_b[jj], dist[ii, jj]
                flip = pa > pb  # cross-block pairs arrive in arbitrary order
                pa[flip], pb[flip] = pb[flip], pa[flip]
                out_a.append(pa)
                out_b.append(pb)
                out_d.append(pd_)
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a)
                    if out_a else np.array([], np.int64),
                    "id_b": np.concatenate(out_b)
                    if out_b else np.array([], np.int64),
                    "dist": np.concatenate(out_d)
                    if out_d else np.array([], np.float64),
                }
            )

    return dist_blocks


def projection_threshold_join(
    df: DataFrame,
    threshold: float,
    bucket_length: float = 2.0,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    seed: int = LSH_SEED,
    row_cap: int = 4096,
) -> DataFrame:
    """EXACT euclidean threshold self-join with LSH-bucketed candidate
    generation — the native replacement for the MLlib
    ``approxSimilarityJoin`` path (:func:`brp_lsh_join`) in the benched
    near-dup row. Same 1-D bucketed-random-projection idea, but with a
    PROVABLE cover instead of an empirically tuned OR of hash tables:
    project every vector onto one deterministic UNIT Gaussian direction
    ``p`` and bucket at ``floor(proj / bucket_length)``. Cauchy-Schwarz
    gives ``|proj(a) - proj(b)| <= ||a - b|| < threshold``, so whenever
    ``threshold <= bucket_length`` a qualifying pair's buckets differ by
    at most 1 — emitting each row under keys ``{bkt, bkt + 1}`` therefore
    guarantees every qualifying pair shares >= 1 key (recall is 1.0 by
    construction, not by tuning). Candidates are verified by TRUE distance
    inside the block-GEMM kernel, so the output EQUALS the exact
    threshold join — the same contract the 12-table MLlib configuration
    was tuned to meet, minus its per-candidate row-at-a-time JVM scoring
    (guide §4.2: batch the math in native code) and its 12x hash explode.

    Scale shape: one scan computes the projection (pure Column expr), the
    two-key emission doubles the id/vector stream once (vs the R-times
    hash-table explode), :func:`_salted_pack` bounds every aggregated
    block to ~``row_cap`` rows regardless of how the projection
    concentrates (population-derived salting — the hot-bucket guard every
    bucketed operator here uses), and only (id_a, id_b, dist) survivor
    triples leave the kernel. The final dedup (a pair whose buckets tie
    shares BOTH keys; identical fold -> identical bits) is one
    ``groupBy(id_a, id_b)`` exchange over result-sized rows. Returns
    ``(id_a, id_b, dist)`` with ``id_a < id_b``."""
    thr = float(threshold)
    L = float(bucket_length)
    if thr > L:
        raise ValueError(
            f"projection_threshold_join requires threshold <= bucket_length "
            f"for the +/-1-bucket cover guarantee (got {thr} > {L})"
        )
    first = df.select(F.size(V.as_double(vector_col)).alias("d")).first()
    dim = int(first.d) if first is not None else 0
    if dim == 0:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, dist double"
        )
    plane = np.asarray(hyperplanes(dim, 1, seed)[0], dtype=np.float64)
    plane = plane / np.linalg.norm(plane)  # unit: |proj diff| <= ||a-b||
    proj = V.dot_product(
        V.as_double(vector_col), V.vector_literal([float(x) for x in plane])
    )
    bkt = F.floor(proj / F.lit(L)).cast("long")
    keyed = df.select(
        F.col(id_col).alias("id"),
        V.as_double(vector_col).alias("v"),
        F.explode(F.array(bkt, bkt + F.lit(1))).alias("bkt"),
    )
    packed = _salted_pack(keyed, ["bkt"], None, row_cap)
    cand = _block_pairs(packed, ["bkt"]).mapInPandas(
        _make_block_threshold_dist_kernel(thr),
        "id_a long, id_b long, dist double",
    )
    return cand.groupBy("id_a", "id_b").agg(F.min("dist").alias("dist"))


def brp_lsh_join(
    df: DataFrame,
    threshold: float,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    seed: int = LSH_SEED,
) -> DataFrame:
    """Approximate euclidean-distance self-join via MLlib
    BucketedRandomProjectionLSH (the library scale path for near-dup mining;
    ≙ the role hnswlib plays in the reference). Returns (id_a, id_b, dist)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col), array_to_vector(V.as_double(vector_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, threshold, distCol="dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.col("dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
