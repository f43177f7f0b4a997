"""Similarity search over an embedding column (`array<float>`).

Two operators:

- ``ann_topk``: brute-force top-k by dot product for a small query set —
  the exactness baseline. The query side is tiny and broadcast; the scan
  side streams once, so the plan is a broadcast nested-loop + partial
  top-k, which survives a 1000-executor scale-up (no shuffle of the big
  side, no cartesian blow-up beyond |queries| × |corpus|).

- ``ann_lsh_best_pairs``: the scale path — random-hyperplane (SimHash)
  bucketing; vectors agreeing on all P hyperplane signs land in one
  bucket (a group-by key, never an all-pairs join), then candidates are
  verified with the exact dot product inside the bucket. This mirrors
  the reference's own fingerprint -> bucket -> verify match probe
  (/root/reference/gdelta.cpp:321-328, 388-393) lifted to vectors.

Everything is integer-exact so a DuckDB oracle can reproduce it:
embeddings are quantized ``floor(x * 10000)`` in float64 (bit-exact in
both engines), hyperplane signs come from md5 parity, and dot products
are int64 sums. No Python UDFs — transform/zip_with/aggregate are
JVM-side, codegen'd.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

QUANT = 10_000  # fixed-point scale: |component| <= 1 -> |q| <= 10000
N_PLANES = 8  # SimHash planes -> 256 buckets
DIM = 64

_EVEN_HEX = list("02468ace")


def quantized_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q: array<long>) — fixed-point embeddings. float32 -> float64
    promotion is exact and float64 multiply/floor is IEEE-deterministic, so
    Spark and DuckDB produce identical integers."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * F.lit(QUANT)).cast("long")
    )
    return e.select("vec_id", q.alias("q"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors by quantized dot product for vec_id < n_queries.

    Plan shape: broadcast the (tiny) query side, stream the corpus once,
    window top-k per query. Ties broken by neighbor_id for determinism.
    """
    v = quantized_embeddings(spark, sf_dir)
    qs = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    dotted = (
        v.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _dot(F.col("qq"), F.col("q")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        dotted.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def _plane_signs(spark: SparkSession) -> DataFrame:
    """(p, d, sgn) — deterministic pseudo-random ±1 hyperplane components
    from md5 parity; identical in any engine that has md5."""
    planes = spark.range(N_PLANES).select(F.col("id").cast("int").alias("p"))
    dims = spark.range(DIM).select(F.col("id").cast("int").alias("d"))
    key = F.md5(F.concat(F.col("p").cast("string"), F.lit("#"), F.col("d").cast("string")))
    sgn = F.when(F.substring(key, 1, 1).isin(_EVEN_HEX), F.lit(1)).otherwise(F.lit(-1))
    return planes.crossJoin(dims).select("p", "d", sgn.alias("sgn"))


def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, bucket) — bucket = bitmask of hyperplane-projection signs.

    The per-vector work is a broadcast join against the (P*D)-row sign
    table plus two hash aggregations keyed by vec_id — fully distributed,
    no driver collect, no all-pairs anything.
    """
    dims = quantized_embeddings(spark, sf_dir).select(
        "vec_id", F.posexplode("q").alias("d", "qx")
    )
    proj = (
        dims.join(F.broadcast(_plane_signs(spark)), "d")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("sgn") * F.col("qx")).alias("v"))
    )
    bit = F.expr("CASE WHEN v > 0 THEN shiftleft(1, p) ELSE 0 END")
    return proj.groupBy("vec_id").agg(F.sum(bit).cast("int").alias("bucket"))


def ann_lsh_best_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per SimHash bucket, the best (max exact dot) candidate pair.

    bucket -> self-join *within* bucket only -> exact-dot verify -> top-1.
    Buckets are group-by keys, so candidate generation scales as
    sum(bucket_size^2), not corpus^2; a production deployment caps bucket
    width (more planes / banding) the same way the salt plan caps groups.
    """
    sig = simhash_buckets(spark, sf_dir)
    v = quantized_embeddings(spark, sf_dir)
    a = sig.alias("a").join(v.alias("va"), F.col("a.vec_id") == F.col("va.vec_id"))
    b = sig.alias("b").join(v.alias("vb"), F.col("b.vec_id") == F.col("vb.vec_id"))
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.bucket").alias("bucket"),
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        _dot(F.col("va.q"), F.col("vb.q")).alias("dot"),
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("dot"), F.asc("vec_a"), F.asc("vec_b"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
        .orderBy("bucket")
    )


N_CELLS = 8  # IVF coarse cells


def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell, q) — IVF coarse quantization: every vector assigned to
    its max-dot centroid (ties -> smallest cell id).

    Centroids are the quantized vectors of ``vec_id < N_CELLS`` — a
    deterministic stand-in for a trained codebook; at production scale the
    codebook comes from a sampled k-means job, but the *assignment plan* is
    identical: broadcast the (tiny) centroid table, stream the corpus once,
    and reduce the N_CELLS candidate dots with a map-side-combinable
    ``max_by`` aggregate — no window shuffle of the fanned-out dots, no
    corpus self-join."""
    v = quantized_embeddings(spark, sf_dir)
    cents = v.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("q").alias("cq")
    )
    dots = v.crossJoin(F.broadcast(cents)).select(
        "vec_id", "q", "cell", _dot(F.col("q"), F.col("cq")).alias("cdot")
    )
    # max_by over struct(cdot, -cell): max dot, then min cell id on ties.
    # q is constant within a vec_id group, so first() is value-deterministic.
    return dots.groupBy("vec_id").agg(
        F.max_by("cell", F.struct(F.col("cdot"), (-F.col("cell")).alias("nc"))).alias("cell"),
        F.first("q").alias("q"),
    )


def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """IVF search at nprobe=1: each query scans ONLY its own coarse cell.

    The scale path for corpora too large to brute-force: candidate work per
    query is |cell| ~ corpus/N_CELLS instead of |corpus|, and the probe is a
    broadcast hash join on the cell id (query side is tiny), so the corpus
    is never shuffled. Recall < 1.0 by construction (a neighbor can live in
    an adjacent cell) — ``ann_topk`` is the exactness baseline; the oracle
    reproduces the same nprobe=1 semantics, so this checks the *algorithm*,
    not closed-world recall.

    Plan note: the query side below re-derives ``ivf_assign`` rather than
    caching it, deliberately — the ``vec_id < n_queries`` filter pushes
    through the aggregate (vec_id is the grouping key) all the way to the
    parquet scan (verified: ``PushedFilters: LessThan(vec_id,10)``), so the
    "second" assignment reads only the n_queries rows. Caching the corpus
    assignment would pin |corpus| embeddings in executor memory for no
    saved work."""
    cells = ivf_assign(spark, sf_dir)
    qs = cells.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "cell", F.col("q").alias("qq")
    )
    dotted = (
        cells.join(F.broadcast(qs), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "cell",
            F.col("vec_id").alias("neighbor_id"),
            _dot(F.col("qq"), F.col("q")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        dotted.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


QUANT_COS = 100  # coarser fixed point so the integer cosine test can't overflow
COS_NUM, COS_DEN = 81, 100  # cos^2 >= 0.81, i.e. cosine >= 0.9


def embed_neardup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup materialization: vectors in the same SimHash
    bucket whose exact cosine is >= 0.9 are duplicates; the higher vec_id of
    every verified pair is dropped; reports per-label kept/total counts.

    The cosine test is INTEGER-exact (so a SQL oracle reproduces it bit for
    bit): with q = floor(x * 100), cosine >= 0.9 iff dot > 0 and
    100*dot^2 >= 81*|a|^2*|b|^2 — at 64 dims and |q| <= 100 every
    intermediate fits int64 with >100x headroom. Candidates come from the
    same hyperplane buckets as ``ann_lsh_best_pairs`` (group-by keys, never
    an all-pairs join); the exact test then plays the reference's
    verify-after-bucket role (gdelta.cpp:388-393)."""
    sig = simhash_buckets(spark, sf_dir)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * F.lit(QUANT_COS)).cast("long")
    )
    v = e.select("vec_id", "label", q.alias("q")).join(sig, "vec_id")
    a, b = v.alias("a"), v.alias("b")
    dot = _dot(F.col("a.q"), F.col("b.q"))
    na = _dot(F.col("a.q"), F.col("a.q"))
    nb = _dot(F.col("b.q"), F.col("b.q"))
    drops = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter((dot > 0) & (dot * dot * COS_DEN >= na * nb * COS_NUM))
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    base = e.select("vec_id", "label")
    kept = base.join(drops, "vec_id", "left_anti")
    total = base.groupBy("label").agg(F.count("*").alias("n_vecs"))
    keptc = kept.groupBy("label").agg(F.count("*").alias("n_kept"))
    return (
        total.join(keptc, "label", "left")
        .select("label", "n_vecs", F.coalesce("n_kept", F.lit(0)).alias("n_kept"))
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (same integer arithmetic, same tie-breaks)

_DIMS_CTE = f"""
dims AS (
  SELECT vec_id, CAST(FLOOR(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT) AS qx, d - 1 AS d
  FROM (
    SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS d
    FROM embeddings
  )
)"""

ANN_TOPK_ORACLE = f"""
WITH {_DIMS_CTE},
dots AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         CAST(SUM(q.qx * v.qx) AS BIGINT) AS dot
  FROM dims q JOIN dims v USING (d)
  WHERE q.vec_id < 10 AND v.vec_id <> q.vec_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, dot, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dot DESC, neighbor_id) AS rnk
  FROM dots
) WHERE rnk <= 5 ORDER BY query_id, rnk
"""

_SIG_CTES = f"""
{_DIMS_CTE},
planes AS (
  SELECT p, d,
         CASE WHEN substr(md5(CAST(p AS VARCHAR) || '#' || CAST(d AS VARCHAR)), 1, 1)
                   IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END AS sgn
  FROM range({N_PLANES}) t(p), range({DIM}) u(d)
),
proj AS (
  SELECT vec_id, p, SUM(sgn * qx) AS v
  FROM dims JOIN planes USING (d) GROUP BY 1, 2
),
sig AS (
  SELECT vec_id, CAST(SUM(CASE WHEN v > 0 THEN 1 << p ELSE 0 END) AS INT) AS bucket
  FROM proj GROUP BY 1
)"""

ANN_LSH_ORACLE = f"""
WITH {_SIG_CTES},
cand AS (
  SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pair_dots AS (
  SELECT c.bucket, c.vec_a, c.vec_b, CAST(SUM(x.qx * y.qx) AS BIGINT) AS dot
  FROM cand c
  JOIN dims x ON x.vec_id = c.vec_a
  JOIN dims y ON y.vec_id = c.vec_b AND y.d = x.d
  GROUP BY 1, 2, 3
)
SELECT bucket, vec_a, vec_b, dot FROM (
  SELECT *, row_number() OVER (PARTITION BY bucket
                               ORDER BY dot DESC, vec_a, vec_b) AS rnk
  FROM pair_dots
) WHERE rnk = 1 ORDER BY bucket
"""

ANN_IVF_ORACLE = f"""
WITH {_DIMS_CTE},
cdots AS (
  SELECT v.vec_id, CAST(c.vec_id AS INT) AS cell,
         CAST(SUM(v.qx * c.qx) AS BIGINT) AS cdot
  FROM dims v JOIN dims c USING (d)
  WHERE c.vec_id < {N_CELLS}
  GROUP BY 1, 2
),
cells AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cdot DESC, cell) AS rnk
    FROM cdots
  ) WHERE rnk = 1
),
cand AS (
  SELECT q.vec_id AS query_id, q.cell, v.vec_id AS neighbor_id
  FROM cells q JOIN cells v ON q.cell = v.cell AND v.vec_id <> q.vec_id
  WHERE q.vec_id < 10
),
dotted AS (
  SELECT c.query_id, c.cell, c.neighbor_id,
         CAST(SUM(x.qx * y.qx) AS BIGINT) AS dot
  FROM cand c
  JOIN dims x ON x.vec_id = c.query_id
  JOIN dims y ON y.vec_id = c.neighbor_id AND y.d = x.d
  GROUP BY 1, 2, 3
)
SELECT query_id, cell, neighbor_id, dot, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dot DESC, neighbor_id) AS rnk
  FROM dotted
) WHERE rnk <= 5 ORDER BY query_id, rnk
"""

EMBED_NEARDUP_ORACLE = f"""
WITH {_SIG_CTES},
dims2 AS (
  SELECT vec_id, CAST(FLOOR(CAST(x AS DOUBLE) * {QUANT_COS}) AS BIGINT) AS qx, d - 1 AS d
  FROM (
    SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS d
    FROM embeddings
  )
),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
verified AS (
  SELECT va, vb FROM (
    SELECT p.va, p.vb,
           CAST(SUM(x.qx * y.qx) AS BIGINT) AS dot,
           CAST(SUM(x.qx * x.qx) AS BIGINT) AS na,
           CAST(SUM(y.qx * y.qx) AS BIGINT) AS nb
    FROM pairs p
    JOIN dims2 x ON x.vec_id = p.va
    JOIN dims2 y ON y.vec_id = p.vb AND y.d = x.d
    GROUP BY 1, 2
  ) WHERE dot > 0 AND dot * dot * {COS_DEN} >= na * nb * {COS_NUM}
),
drops AS (SELECT DISTINCT vb AS vec_id FROM verified)
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(CASE WHEN drops.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM embeddings LEFT JOIN drops USING (vec_id)
GROUP BY label ORDER BY label
"""


def ann_ivf_nprobe2(
    spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """IVF search at nprobe=2: each query scans its TWO nearest coarse
    cells — the standard recall mitigation for nprobe=1's miss of neighbors
    living just across a cell boundary. The corpus stays assigned to one
    cell each; only the (tiny) query side fans out x2 before the broadcast
    hash join on the cell id, so candidate work per query is 2*|corpus|/N
    and the corpus is still never shuffled."""
    v = quantized_embeddings(spark, sf_dir)
    cents = v.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("q").alias("cq")
    )
    dots = v.crossJoin(F.broadcast(cents)).select(
        "vec_id", "q", "cell", _dot(F.col("q"), F.col("cq")).alias("cdot")
    )
    w_cell = Window.partitionBy("vec_id").orderBy(F.desc("cdot"), F.asc("cell"))
    ranked = dots.withColumn("crnk", F.row_number().over(w_cell))
    cells = ranked.filter(F.col("crnk") == 1).select("vec_id", "cell", "q")
    # query side: top-2 cells per query vector (rows fan out x2, but only
    # for the n_queries vectors — the filter pushes to the parquet scan)
    qcells = (
        ranked.filter((F.col("vec_id") < n_queries) & (F.col("crnk") <= 2))
        .select(F.col("vec_id").alias("query_id"), "cell", F.col("q").alias("qq"))
    )
    dotted = (
        cells.join(F.broadcast(qcells), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _dot(F.col("qq"), F.col("q")).alias("dot"),
        )
        # a neighbor can appear via both probed cells only if duplicated —
        # cells are disjoint per corpus vector, so no distinct needed
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        dotted.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


ANN_IVF2_ORACLE = f"""
WITH {_DIMS_CTE},
cdots AS (
  SELECT v.vec_id, CAST(c.vec_id AS INT) AS cell,
         CAST(SUM(v.qx * c.qx) AS BIGINT) AS cdot
  FROM dims v JOIN dims c USING (d)
  WHERE c.vec_id < {N_CELLS}
  GROUP BY 1, 2
),
ranked AS (
  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cdot DESC, cell) AS crnk
  FROM cdots
),
cells AS (SELECT vec_id, cell FROM ranked WHERE crnk = 1),
qcells AS (SELECT vec_id AS query_id, cell FROM ranked
           WHERE crnk <= 2 AND vec_id < 10),
cand AS (
  SELECT q.query_id, v.vec_id AS neighbor_id
  FROM qcells q JOIN cells v ON q.cell = v.cell AND v.vec_id <> q.query_id
),
dotted AS (
  SELECT c.query_id, c.neighbor_id, CAST(SUM(x.qx * y.qx) AS BIGINT) AS dot
  FROM cand c
  JOIN dims x ON x.vec_id = c.query_id
  JOIN dims y ON y.vec_id = c.neighbor_id AND y.d = x.d
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, dot, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dot DESC, neighbor_id) AS rnk
  FROM dotted
) WHERE rnk <= 5 ORDER BY query_id, rnk
"""
