"""Round-11 wave: the operator classes VERDICT r10 #7 named as genuinely
absent — baseline JPEG decode (the lossy half of the codec family, pure
stdlib+numpy: Huffman, DC prediction, dequantize, exact-integer IDCT)
and a DiskANN-class (Vamana) on-disk graph ANN index served next to the
NSW/IVF/PQ family.

Reference parity note: the reference repo (Warhorze/apache_beam_challange)
has no multimodal or vector surface; this module extends the §2.9
extension surface (SURVEY.md).

Conventions follow wave5/wave6: fixed-point-before-sum, pinned literal
tables (the 1e-6 DCT basis and Annex K quantizers cross the engines as
VALUES lists), every engine-side float from an exact-integer numerator
through a single division, and the sign-of-zero rule (wave6 docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_beam_challange_spark.operators.jpeg import JPEG_Q, JPEG_T_FP6
from apache_beam_challange_spark.plans.registry import query
from apache_beam_challange_spark.sources.catalog import load_table

# --- baseline JPEG encode -> decode reconstruction audit -----------------------

_JPEG_T_VALUES = ", ".join(f"({u}, {x}, {t})" for u, x, t in JPEG_T_FP6)
_JPEG_Q_VALUES = ", ".join(
    f"({v}, {u}, {JPEG_Q[v * 8 + u]})" for v in range(8) for u in range(8)
)

_JPEG_SQL = f"""
WITH dims AS (
    SELECT doc_id, 8 * (doc_id % 3 + 1) AS w, 8 * (doc_id % 2 + 1) AS h
    FROM documents
),
px AS (
    SELECT d.doc_id, d.w, d.h, xs.x, ys.y,
           CAST((d.doc_id * 7 + ys.y * 31 + xs.x * 5) % 256 AS BIGINT) AS gray
    FROM dims d
    JOIN (SELECT unnest(generate_series(0, 23)) AS x) xs ON xs.x < d.w
    JOIN (SELECT unnest(generate_series(0, 15)) AS y) ys ON ys.y < d.h
),
t AS (SELECT u, x, CAST(tf AS BIGINT) AS tf
      FROM (VALUES {_JPEG_T_VALUES}) t(u, x, tf)),
q8 AS (SELECT v, u, CAST(qv AS BIGINT) AS qv
       FROM (VALUES {_JPEG_Q_VALUES}) q(v, u, qv)),
coef AS (
    SELECT p.doc_id, p.x // 8 AS bx, p.y // 8 AS by, tu.u AS u, tv.u AS v,
           CAST(SUM(tu.tf * tv.tf * (p.gray - 128)) AS BIGINT) AS s
    FROM px p
    JOIN t tu ON tu.x = p.x % 8
    JOIN t tv ON tv.x = p.y % 8
    GROUP BY 1, 2, 3, 4, 5
),
quant AS (
    SELECT c.doc_id, c.bx, c.by, c.u, c.v,
           ((2 * c.s + q8.qv * 1000000000000
             + 4096 * q8.qv * 1000000000000)
            // (2 * q8.qv * 1000000000000) - 2048) * q8.qv AS r
    FROM coef c JOIN q8 ON q8.u = c.u AND q8.v = c.v
),
recon AS (
    SELECT q.doc_id, q.bx * 8 + tu.x AS x, q.by * 8 + tv.x AS y,
           CAST(SUM(tu.tf * tv.tf * q.r) AS BIGINT) AS s2
    FROM quant q
    JOIN t tu ON tu.u = q.u
    JOIN t tv ON tv.u = q.v
    GROUP BY 1, 2, 3
),
rpx AS (
    SELECT doc_id, x, y,
           LEAST(255, GREATEST(0,
             (2 * s2 + 1000000000000 + 262144 * 1000000000000)
             // 2000000000000 - 131072 + 128)) AS recon
    FROM recon
)
SELECT r.doc_id,
       CAST(d.w AS INTEGER) AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST((d.w // 8) * (d.h // 8) AS INTEGER) AS n_blocks,
       CAST(SUM(r.recon) AS BIGINT) AS recon_sum,
       CAST(SUM(ABS(r.recon - ((r.doc_id * 7 + r.y * 31 + r.x * 5) % 256)))
            AS BIGINT) AS err_abs_sum,
       CAST(MAX(CASE WHEN r.y = d.h - 1 AND r.x = d.w - 1
                THEN r.recon END) AS INTEGER) AS corner_recon
FROM rpx r JOIN dims d ON d.doc_id = r.doc_id
GROUP BY r.doc_id, d.w, d.h
ORDER BY r.doc_id
""".strip()


@query("multimodal_decode_jpeg", oracle=_JPEG_SQL)
def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSY image codec round-trip (VERDICT r10 #7) completing the
    BMP/PNG/WAV family: encode a real baseline JFIF per document — DQT,
    SOF0, the Annex K luminance Huffman tables, DC prediction, byte
    stuffing — then decode the actual bytes back (marker walk, canonical
    Huffman decode, dequantize with the FILE's table, exact-integer
    IDCT with the pinned 1e-6 cosine basis) behind mapInPandas. Because
    quantization is exact integer arithmetic on both sides, the oracle
    replays the full DCT->quantize->IDCT chain relationally from the
    closed-form pixels and the reconstruction matches bit-for-bit: a
    decoder slip anywhere (zigzag transposition, missed 0xFF00 unstuff,
    broken DC predictor, wrong Q table) hash-fails. ``err_abs_sum``
    audits the lossy error mass the quantizer actually injected.
    Per-doc fan-out is bounded (<= 6 blocks x 64 coefficients); the
    decode UDF is Arrow-batched and row-linear — scales like the other
    codec queries."""
    from apache_beam_challange_spark.operators.jpeg import (
        attach_jpeg_image,
        decode_jpeg_pixels,
    )

    docs = load_table(spark, sf_dir, "documents")
    dims = docs.select(
        "doc_id",
        (8 * (F.col("doc_id") % 3 + 1)).cast("long").alias("w"),
        (8 * (F.col("doc_id") % 2 + 1)).cast("long").alias("h"),
    )
    px = decode_jpeg_pixels(attach_jpeg_image(docs))
    orig = (F.col("doc_id") * 7 + F.col("y") * 31 + F.col("x") * 5) % 256
    return (
        px.join(F.broadcast(dims), "doc_id")
        .groupBy("doc_id", "w", "h")
        .agg(
            F.sum("recon").cast("long").alias("recon_sum"),
            F.sum(F.abs(F.col("recon") - orig)).cast("long").alias(
                "err_abs_sum"
            ),
            F.max(
                F.when(
                    (F.col("y") == F.col("h") - 1)
                    & (F.col("x") == F.col("w") - 1),
                    F.col("recon"),
                )
            ).cast("int").alias("corner_recon"),
        )
        .select(
            "doc_id",
            F.col("w").cast("int").alias("width"),
            F.col("h").cast("int").alias("height"),
            F.expr("CAST((w div 8) * (h div 8) AS INT)").alias("n_blocks"),
            "recon_sum",
            "err_abs_sum",
            "corner_recon",
        )
        .orderBy("doc_id")
    )


# --- DiskANN-class (Vamana) graph ANN ------------------------------------------

from apache_beam_challange_spark.sources.catalog import (  # noqa: E402
    is_materialized,
    warehouse_path,
)


def _vamana_prune_round_sql(i: int) -> str:
    """One alpha-RobustPrune round, materialized: keep the closest
    surviving candidate per node, discard everything it alpha-covers
    (exact integer fixed-point test — no double comparison anywhere)."""
    return f"""
w{i} AS MATERIALIZED (
    SELECT src, dst, c_fp FROM (
        SELECT p.*, ROW_NUMBER() OVER (PARTITION BY src ORDER BY rk) AS mr
        FROM p{i - 1} p
    ) t WHERE mr = 1
),
p{i} AS MATERIALIZED (
    SELECT p.src, p.dst, p.c_fp, p.rk
    FROM p{i - 1} p
    JOIN w{i} w ON w.src = p.src
    JOIN pp ON pp.src = p.src AND pp.di = w.dst AND pp.dj = p.dst
    WHERE p.dst <> w.dst
      AND NOT (12 * (1000000000 - pp.cc_fp) <= 10 * (1000000000 - p.c_fp))
)""".strip()


def _vamana_serve_round_sql(r: int) -> str:
    prev = f"sv{r - 1}"
    exclude = " UNION ALL ".join(f"SELECT vec_id FROM sf{i}" for i in range(1, r))
    not_in = f"WHERE vec_id NOT IN ({exclude})" if exclude else ""
    return f"""
sf{r} AS MATERIALIZED (
    SELECT vec_id FROM {prev} {not_in}
    ORDER BY qf DESC, vec_id LIMIT 16
),
sv{r} AS MATERIALIZED (
    SELECT * FROM {prev}
    UNION
    SELECT v.vec_id,
           CAST(FLOOR(list_cosine_similarity(v.v, q.qv) * 1e9) AS BIGINT)
    FROM vecs v CROSS JOIN q
    WHERE v.vec_id IN (SELECT a.dst FROM adj a
                       JOIN sf{r} ON a.src = sf{r}.vec_id)
      AND v.vec_id <> 0
)""".strip()


_VAMANA_GRAPH_CTE = f"""
vecs AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
comp AS (
    SELECT vec_id, unnest(v) AS x, unnest(generate_series(1, 64)) AS j
    FROM vecs
),
proj AS (
    SELECT vec_id, p.p,
           SUM(x * (sin(p.p * 64 + j) * 43758.5453
                    - FLOOR(sin(p.p * 64 + j) * 43758.5453) - 0.5)) AS s
    FROM comp, (SELECT unnest(generate_series(0, 15)) AS p) p
    GROUP BY vec_id, p.p
),
buck AS (
    SELECT vec_id, p // 4 AS table_idx,
           STRING_AGG(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                      ORDER BY p) AS bucket
    FROM proj
    GROUP BY vec_id, p // 4
),
bpairs AS (
    SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
    FROM buck a
    JOIN buck b ON a.table_idx = b.table_idx AND a.bucket = b.bucket
              AND a.vec_id <> b.vec_id
),
cand AS MATERIALIZED (
    SELECT src, dst, c_fp, rk FROM (
        SELECT p.src, p.dst,
               CAST(FLOOR(list_cosine_similarity(va.v, vb.v) * 1e9)
                    AS BIGINT) AS c_fp,
               ROW_NUMBER() OVER (PARTITION BY p.src
                   ORDER BY CAST(FLOOR(list_cosine_similarity(va.v, vb.v)
                                       * 1e9) AS BIGINT) DESC, p.dst
               ) AS rk
        FROM bpairs p
        JOIN vecs va ON va.vec_id = p.src
        JOIN vecs vb ON vb.vec_id = p.dst
    ) t WHERE rk <= 24
),
pp AS MATERIALIZED (
    SELECT a.src, a.dst AS di, b.dst AS dj,
           CAST(FLOOR(list_cosine_similarity(vi.v, vj.v) * 1e9)
                AS BIGINT) AS cc_fp
    FROM cand a
    JOIN cand b ON a.src = b.src AND a.dst <> b.dst
    JOIN vecs vi ON vi.vec_id = a.dst
    JOIN vecs vj ON vj.vec_id = b.dst
),
p0 AS MATERIALIZED (SELECT src, dst, c_fp, rk FROM cand),
{",".join(_vamana_prune_round_sql(i) for i in range(1, 9))},
kept AS ({" UNION ALL ".join(f"SELECT * FROM w{i}" for i in range(1, 9))}),
adj AS MATERIALIZED (
    SELECT src, dst, c_fp FROM (
        SELECT m.*, ROW_NUMBER() OVER (PARTITION BY src
                       ORDER BY c_fp DESC, dst) AS rk
        FROM (SELECT DISTINCT * FROM (
                SELECT src, dst, c_fp FROM kept
                UNION ALL
                SELECT dst AS src, src AS dst, c_fp FROM kept
             ) u) m
    ) t WHERE rk <= 12
),
compm AS (
    SELECT vec_id, j, CAST(FLOOR(x * 1e6) AS BIGINT) AS x_fp FROM comp
),
cent AS (SELECT j, CAST(SUM(x_fp) AS BIGINT) AS cj FROM compm GROUP BY j),
msc AS (
    SELECT vec_id,
           SUM(CAST(x_fp AS HUGEINT) * cj) AS m_num,
           SUM(CAST(x_fp AS HUGEINT) * x_fp) AS n2
    FROM compm JOIN cent USING (j) GROUP BY vec_id
),
med AS (
    SELECT vec_id FROM msc
    ORDER BY CAST(m_num AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)) DESC, vec_id
    LIMIT 1
)
""".strip()

_VAMANA_SQL = f"""
WITH {_VAMANA_GRAPH_CTE},
q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
sv0 AS MATERIALIZED (
    SELECT v.vec_id,
           CAST(FLOOR(list_cosine_similarity(v.v, q.qv) * 1e9) AS BIGINT)
               AS qf
    FROM vecs v CROSS JOIN q
    JOIN med ON v.vec_id = med.vec_id
    WHERE v.vec_id <> 0
),
{",".join(_vamana_serve_round_sql(r) for r in range(1, 9))}
SELECT t.vec_id, ve.label,
       ROUND(CAST(t.qf AS DOUBLE) / 1e9, 6) AS cosine_sim
FROM sv8 t JOIN vecs ve ON ve.vec_id = t.vec_id
ORDER BY t.qf DESC, t.vec_id
LIMIT 20
""".strip()


@query("vamana_topk_vec0", oracle=_VAMANA_SQL)
def vamana_topk_vec0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiskANN-class graph ANN (VERDICT r10 #7) next to the NSW/IVF/PQ
    family — the three Vamana ingredients NSW lacks: (1) alpha-
    RobustPrune edge selection (keeps a deliberate short+long-range edge
    mix — a cogrouped applyInPandas greedy over bounded C^2-per-node
    pools, every alpha-cover test in exact 1e9 fixed point; the oracle
    replays it as unrolled relational rounds), (2) reverse-edge merge with a degree cap, (3)
    single-MEDOID entry (exact integer centroid dot, one double
    division) instead of NSW's coarse seed sample. BUILD once at rest
    (bucket-bounded candidates, C^2-per-node prune pairs — never
    all-pairs; src-sorted adjacency + one-row medoid sidecar; adjacency
    committed LAST per the torn-artifact rule). SERVE with the bounded
    greedy beam (6 rounds x beam 8 through degree-12 adjacency):
    parameter-bounded collects re-issued as pushed IN-list point
    lookups — per-query work independent of corpus size. The oracle
    replays build AND search move-for-move (unrolled materialized CTE
    rounds), so any divergence in pruning, capping, entry choice, or
    beam traversal hash-fails."""
    from apache_beam_challange_spark.operators.similarity import (
        vamana_topk,
        vamana_write_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = warehouse_path(sf_dir, "vamana_idx_c24r8a12", "embeddings")
    if not is_materialized(path):
        vamana_write_index(emb, path)
    adjacency = spark.read.parquet(path)
    medoid_id = int(
        spark.read.parquet(path + "_medoid").first()["medoid_id"]
    )
    return vamana_topk(emb, adjacency, medoid_id, query_vec_id=0)


def _vamana_batch_round_sql(r: int) -> str:
    """One unrolled round of the BATCH beam search over the Vamana graph:
    per-qid top-16 unexpanded frontier (fixed-point qf desc / vec_id
    ties), adjacency expansion, score only unseen (qid, vec_id) pairs;
    the UNION dedup mirrors the engine's anti-join (re-scored rows are
    bit-identical integers)."""
    prev = f"bv{r - 1}"
    exclude = " UNION ALL ".join(
        f"SELECT qid, vec_id FROM bf{i}" for i in range(1, r)
    )
    not_exists = (
        f"""WHERE NOT EXISTS (
            SELECT 1 FROM ({exclude}) u
            WHERE u.qid = pv.qid AND u.vec_id = pv.vec_id)"""
        if exclude
        else ""
    )
    return f"""
bf{r} AS MATERIALIZED (
    SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY qf DESC, vec_id) AS rk
        FROM {prev} pv {not_exists}
    ) WHERE rk <= 16
),
bv{r} AS MATERIALIZED (
    SELECT * FROM {prev}
    UNION
    SELECT n.qid, n.vec_id,
           CAST(FLOOR(list_cosine_similarity(v.v, q.qv) * 1e9) AS BIGINT)
    FROM (SELECT DISTINCT f.qid, a.dst AS vec_id
          FROM adj a JOIN bf{r} f ON a.src = f.vec_id) n
    JOIN vecs v ON v.vec_id = n.vec_id
    JOIN qset q ON q.qid = n.qid
    WHERE n.vec_id <> n.qid
)""".strip()


_VAMANA_BATCH_SQL = f"""
WITH {_VAMANA_GRAPH_CTE},
qset AS (SELECT vec_id AS qid, v AS qv FROM vecs WHERE vec_id < 10),
bv0 AS MATERIALIZED (
    SELECT q.qid, v.vec_id,
           CAST(FLOOR(list_cosine_similarity(v.v, q.qv) * 1e9) AS BIGINT)
               AS qf
    FROM vecs v CROSS JOIN qset q
    JOIN med ON v.vec_id = med.vec_id
    WHERE v.vec_id <> q.qid
),
{",".join(_vamana_batch_round_sql(r) for r in range(1, 9))}
SELECT query_vec_id, vec_id, label, cosine_sim FROM (
    SELECT t.qid AS query_vec_id, t.vec_id, ve.label,
           ROUND(CAST(t.qf AS DOUBLE) / 1e9, 6) AS cosine_sim,
           ROW_NUMBER() OVER (PARTITION BY t.qid
               ORDER BY t.qf DESC, t.vec_id) AS rk
    FROM bv8 t JOIN vecs ve ON ve.vec_id = t.vec_id
) WHERE rk <= 5
ORDER BY query_vec_id, cosine_sim DESC, vec_id
""".strip()


@query("vamana_knn_join_vec10", oracle=_VAMANA_BATCH_SQL)
def vamana_knn_join_vec10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched Vamana serving — family parity with the round-8 batched
    NSW/LSH/MIPS/IVFPQ twins: top-5 neighbors for EVERY query in a
    10-vector batch through one qid-keyed frontier plan from the single
    medoid entry. Driver-side work is rounds+1 localCheckpoints
    independent of batch size (no collect in the search); the oracle
    replays the shared graph build, medoid, and all 8 batch rounds
    move-for-move on the identical fixed-point integers."""
    from apache_beam_challange_spark.operators.similarity import (
        vamana_topk_batch,
        vamana_write_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = warehouse_path(sf_dir, "vamana_idx_c24r8a12", "embeddings")
    if not is_materialized(path):
        vamana_write_index(emb, path)
    adjacency = spark.read.parquet(path)
    medoid_id = int(
        spark.read.parquet(path + "_medoid").first()["medoid_id"]
    )
    return vamana_topk_batch(
        emb, adjacency, medoid_id, query_ids=list(range(10)), k=5
    )


# --- perceptual hash over LOSSY-decoded JPEG pixels ---------------------------

from apache_beam_challange_spark.plans.wave6 import (  # noqa: E402
    _DCT_CU,
    _DCT_CU_VALUES,
    _DCT_CV,
    _DCT_CV_VALUES,
)
from pyspark.sql.window import Window  # noqa: E402

#: the JPEG reconstruction chain (dims..rpx) shared by the decode audit
#: and the pHash query — sliced once from _JPEG_SQL so the two oracles
#: can never drift apart.
_JPEG_RECON_CTE = _JPEG_SQL[len("WITH "):_JPEG_SQL.index("\n)\nSELECT r.doc_id") + 2]

_JPEG_PHASH_SQL = f"""
WITH {_JPEG_RECON_CTE},
cells AS (
    SELECT r.doc_id, (r.x * 4) // d.w AS cx, (r.y * 3) // d.h AS cy,
           CAST(SUM(r.recon) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
    FROM rpx r JOIN dims d ON d.doc_id = r.doc_id
    GROUP BY 1, 2, 3
),
means AS (
    SELECT doc_id, cx, cy, (s * 1000000) // c AS m_fp FROM cells
),
cu AS (SELECT * FROM (VALUES {_DCT_CU_VALUES}) t(u, cx, cu_fp)),
cv AS (SELECT * FROM (VALUES {_DCT_CV_VALUES}) t(v, cy, cv_fp)),
dcoef AS (
    SELECT m.doc_id, cu.u, cv.v,
           CAST(SUM(CAST(m.m_fp AS HUGEINT) * cu.cu_fp * cv.cv_fp)
                AS DECIMAL(38,0)) AS a
    FROM means m
    JOIN cu ON cu.cx = m.cx
    JOIN cv ON cv.cy = m.cy
    WHERE NOT (cu.u = 0 AND cv.v = 0)
    GROUP BY 1, 2, 3
),
ranked AS (
    SELECT doc_id, u, v, a,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY a, u, v) AS rn
    FROM dcoef
),
dmed AS (SELECT doc_id, a AS med_a FROM ranked WHERE rn = 6)
SELECT c.doc_id,
       CAST(SUM(CASE WHEN c.a > m.med_a
                THEN CAST(POWER(2, c.u * 3 + c.v - 1) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS dct_hash
FROM dcoef c JOIN dmed m ON m.doc_id = c.doc_id
GROUP BY 1
ORDER BY c.doc_id
""".strip()


@query("image_jpeg_dct_phash", oracle=_JPEG_PHASH_SQL)
def image_jpeg_dct_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec->dedup PIPELINE COMPOSITION: the wave6 DCT perceptual hash
    computed over REAL lossy-decoded JPEG pixels — the shape an actual
    training-data pipeline runs (web images arrive JPEG-compressed; the
    dedup hash must be computed on what decoders actually reconstruct,
    not on pristine source pixels). Engine: real byte decode
    (mapInPandas) -> exact 4x3 integer pooling -> pinned-cosine 2-D DCT
    joins -> exact-median threshold hash. The oracle replays the ENTIRE
    chain — forward DCT, quantizer, IDCT, pooling, hash — relationally,
    so a slip anywhere in codec OR hash hash-fails. Bounded per-doc
    fan-out (pixels + 12x12 coefficient join), row-linear."""
    from apache_beam_challange_spark.operators.jpeg import (
        attach_jpeg_image,
        decode_jpeg_pixels,
    )

    docs = load_table(spark, sf_dir, "documents")
    dims = docs.select(
        "doc_id",
        (8 * (F.col("doc_id") % 3 + 1)).cast("long").alias("w"),
        (8 * (F.col("doc_id") % 2 + 1)).cast("long").alias("h"),
    )
    px = decode_jpeg_pixels(attach_jpeg_image(docs)).join(
        F.broadcast(dims), "doc_id"
    )
    cells = px.groupBy(
        "doc_id",
        F.expr("(x * 4) div w").alias("cx"),
        F.expr("(y * 3) div h").alias("cy"),
    ).agg(
        F.sum("recon").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    means = cells.select(
        "doc_id", "cx", "cy", F.expr("(s * 1000000) div c").alias("m_fp")
    )
    spark_s = docs.sparkSession
    cu = F.broadcast(
        spark_s.createDataFrame(_DCT_CU, "u long, cx long, cu_fp long")
    )
    cv = F.broadcast(
        spark_s.createDataFrame(_DCT_CV, "v long, cy long, cv_fp long")
    )
    d38 = "decimal(38,0)"
    coef = (
        means.join(cu, "cx")
        .join(cv, "cy")
        .filter(~((F.col("u") == 0) & (F.col("v") == 0)))
        .groupBy("doc_id", "u", "v")
        .agg(
            F.sum(
                F.col("m_fp").cast(d38)
                * F.col("cu_fp").cast(d38)
                * F.col("cv_fp").cast(d38)
            )
            .cast(d38)
            .alias("a")
        )
    )
    # r13 (guide §2.4): the median pick and the hash fold previously fanned
    # coef into two consumers behind an eager localCheckpoint (checkpoint
    # job + self-join exchange). One window pass computes the rn=6 median
    # as an analytic over the same partition key instead — no checkpoint,
    # no join, identical result (med_a per doc IS the rn=6 coefficient).
    w_rn = Window.partitionBy("doc_id").orderBy("a", "u", "v")
    w_doc = Window.partitionBy("doc_id")
    return (
        coef.withColumn("rn", F.row_number().over(w_rn))
        .withColumn(
            "med_a",
            F.max(F.when(F.col("rn") == 6, F.col("a"))).over(w_doc),
        )
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("a") > F.col("med_a"),
                    F.expr("CAST(pow(2, u * 3 + v - 1) AS BIGINT)"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("dct_hash")
        )
        .orderBy("doc_id")
    )


# --- color baseline JPEG (4:2:0 interleaved) -----------------------------------

from apache_beam_challange_spark.operators.jpeg import JPEG_QC  # noqa: E402

_JPEG_QC_VALUES = ", ".join(
    f"({v}, {u}, {JPEG_QC[v * 8 + u]})" for v in range(8) for u in range(8)
)

_JPEG_COLOR_SQL = f"""
WITH dims AS (
    SELECT doc_id, 16 * (doc_id % 2 + 1) AS w, 16 AS h FROM documents
),
rgb AS (
    SELECT d.doc_id, d.w, d.h, xs.x, ys.y,
           CAST((d.doc_id * 7 + ys.y * 31 + xs.x * 5) % 256 AS BIGINT) AS r,
           CAST((d.doc_id * 7 + ys.y * 31 + xs.x * 5 + 11) % 256 AS BIGINT) AS g,
           CAST((d.doc_id * 7 + ys.y * 31 + xs.x * 5 + 22) % 256 AS BIGINT) AS b
    FROM dims d
    JOIN (SELECT unnest(generate_series(0, 31)) AS x) xs ON xs.x < d.w
    JOIN (SELECT unnest(generate_series(0, 15)) AS y) ys ON ys.y < d.h
),
ycc AS (
    SELECT doc_id, w, h, x, y,
           LEAST(255, GREATEST(0,
             (299000 * r + 587000 * g + 114000 * b + 500000) // 1000000))
               AS yv,
           LEAST(255, GREATEST(0,
             (128000000 - 168736 * r - 331264 * g + 500000 * b + 500000)
             // 1000000)) AS cbv,
           LEAST(255, GREATEST(0,
             (128000000 + 500000 * r - 418688 * g - 81312 * b + 500000)
             // 1000000)) AS crv
    FROM rgb
),
t AS (SELECT u, x, CAST(tf AS BIGINT) AS tf
      FROM (VALUES {_JPEG_T_VALUES}) t(u, x, tf)),
q8 AS (SELECT v, u, CAST(qv AS BIGINT) AS qv
       FROM (VALUES {_JPEG_Q_VALUES}) q(v, u, qv)),
qc AS (SELECT v, u, CAST(qv AS BIGINT) AS qv
       FROM (VALUES {_JPEG_QC_VALUES}) q(v, u, qv)),
ycoef AS (
    SELECT p.doc_id, p.x // 8 AS bx, p.y // 8 AS by, tu.u AS u, tv.u AS v,
           CAST(SUM(tu.tf * tv.tf * (p.yv - 128)) AS BIGINT) AS s
    FROM ycc p
    JOIN t tu ON tu.x = p.x % 8
    JOIN t tv ON tv.x = p.y % 8
    GROUP BY 1, 2, 3, 4, 5
),
yquant AS (
    SELECT c.doc_id, c.bx, c.by, c.u, c.v,
           ((2 * c.s + q8.qv * 1000000000000
             + 4096 * q8.qv * 1000000000000)
            // (2 * q8.qv * 1000000000000) - 2048) * q8.qv AS rq
    FROM ycoef c JOIN q8 ON q8.u = c.u AND q8.v = c.v
),
yrecon AS (
    SELECT q.doc_id, q.bx * 8 + tu.x AS x, q.by * 8 + tv.x AS y,
           LEAST(255, GREATEST(0,
             (2 * CAST(SUM(tu.tf * tv.tf * q.rq) AS BIGINT)
              + 1000000000000 + 262144 * 1000000000000)
             // 2000000000000 - 131072 + 128)) AS yr
    FROM yquant q
    JOIN t tu ON tu.u = q.u
    JOIN t tv ON tv.u = q.v
    GROUP BY 1, q.bx, q.by, tu.x, tv.x
),
sub AS (
    SELECT doc_id, x // 2 AS cx, y // 2 AS cy,
           (CAST(SUM(cbv) AS BIGINT) + 2) // 4 AS cb2,
           (CAST(SUM(crv) AS BIGINT) + 2) // 4 AS cr2
    FROM ycc GROUP BY 1, 2, 3
),
ccoef AS (
    SELECT p.doc_id, p.cx // 8 AS bx, p.cy // 8 AS by, tu.u AS u, tv.u AS v,
           CAST(SUM(tu.tf * tv.tf * (p.cb2 - 128)) AS BIGINT) AS sb,
           CAST(SUM(tu.tf * tv.tf * (p.cr2 - 128)) AS BIGINT) AS sr
    FROM sub p
    JOIN t tu ON tu.x = p.cx % 8
    JOIN t tv ON tv.x = p.cy % 8
    GROUP BY 1, 2, 3, 4, 5
),
cquant AS (
    SELECT c.doc_id, c.bx, c.by, c.u, c.v,
           ((2 * c.sb + qc.qv * 1000000000000
             + 4096 * qc.qv * 1000000000000)
            // (2 * qc.qv * 1000000000000) - 2048) * qc.qv AS rb,
           ((2 * c.sr + qc.qv * 1000000000000
             + 4096 * qc.qv * 1000000000000)
            // (2 * qc.qv * 1000000000000) - 2048) * qc.qv AS rr
    FROM ccoef c JOIN qc ON qc.u = c.u AND qc.v = c.v
),
crecon AS (
    SELECT q.doc_id, q.bx * 8 + tu.x AS cx, q.by * 8 + tv.x AS cy,
           LEAST(255, GREATEST(0,
             (2 * CAST(SUM(tu.tf * tv.tf * q.rb) AS BIGINT)
              + 1000000000000 + 262144 * 1000000000000)
             // 2000000000000 - 131072 + 128)) AS cbr,
           LEAST(255, GREATEST(0,
             (2 * CAST(SUM(tu.tf * tv.tf * q.rr) AS BIGINT)
              + 1000000000000 + 262144 * 1000000000000)
             // 2000000000000 - 131072 + 128)) AS crr
    FROM cquant q
    JOIN t tu ON tu.u = q.u
    JOIN t tv ON tv.u = q.v
    GROUP BY 1, q.bx, q.by, tu.x, tv.x
),
full_px AS (
    SELECT yp.doc_id, yp.x, yp.y, yp.yr, cp.cbr, cp.crr
    FROM yrecon yp
    JOIN crecon cp ON cp.doc_id = yp.doc_id
                  AND cp.cx = yp.x // 2 AND cp.cy = yp.y // 2
),
rgb2 AS (
    SELECT doc_id, x, y,
           LEAST(255, GREATEST(0,
             (2 * (yr * 1000000 + 1402000 * (crr - 128))
              + 1000000 + 1024 * 2000000) // 2000000 - 1024)) AS r2,
           LEAST(255, GREATEST(0,
             (2 * (yr * 1000000 - 344136 * (cbr - 128)
                   - 714136 * (crr - 128))
              + 1000000 + 1024 * 2000000) // 2000000 - 1024)) AS g2,
           LEAST(255, GREATEST(0,
             (2 * (yr * 1000000 + 1772000 * (cbr - 128))
              + 1000000 + 1024 * 2000000) // 2000000 - 1024)) AS b2
    FROM full_px
)
SELECT p.doc_id,
       CAST(d.w AS INTEGER) AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST(d.w // 16 AS INTEGER) AS n_mcus,
       CAST(SUM(p.r2 + p.g2 + p.b2) AS BIGINT) AS recon_sum,
       CAST(SUM(ABS(p.r2 - ((p.doc_id * 7 + p.y * 31 + p.x * 5) % 256))
              + ABS(p.g2 - ((p.doc_id * 7 + p.y * 31 + p.x * 5 + 11) % 256))
              + ABS(p.b2 - ((p.doc_id * 7 + p.y * 31 + p.x * 5 + 22) % 256)))
            AS BIGINT) AS err_abs_sum,
       CAST(MAX(CASE WHEN p.y = d.h - 1 AND p.x = d.w - 1
                THEN p.r2 END) AS INTEGER) AS corner_r
FROM rgb2 p JOIN dims d ON d.doc_id = p.doc_id
GROUP BY p.doc_id, d.w, d.h
ORDER BY p.doc_id
""".strip()


@query("multimodal_decode_jpeg_color", oracle=_JPEG_COLOR_SQL)
def multimodal_decode_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-COLOR baseline JPEG round-trip — the form most web images
    actually take: YCbCr with 4:2:0 chroma subsampling, interleaved
    16x16 MCUs (Y00 Y01 Y10 Y11 Cb Cr), per-component quantizers (Annex
    K.1 luma + chroma) and Huffman tables (Annex K.3), independent DC
    predictors per component. The engine decodes the real bytes
    (3-component SOF0 parse, per-component table selection, interleaved
    entropy decode, exact-integer IDCT, chroma replication upsample,
    exact-integer inverse BT.601); the oracle replays the ENTIRE lossy
    pipeline relationally — forward color transform, 2x2 box subsample,
    both DCT/quantize paths, reconstruction, upsample, inverse color —
    and matches bit-for-bit. err_abs_sum audits the (much larger)
    chroma-quantizer error mass; n_mcus pins the interleave layout."""
    from apache_beam_challange_spark.operators.jpeg import (
        attach_jpeg_color_image,
        decode_jpeg_color_pixels,
    )

    docs = load_table(spark, sf_dir, "documents")
    dims = docs.select(
        "doc_id",
        (16 * (F.col("doc_id") % 2 + 1)).cast("long").alias("w"),
        F.lit(16).cast("long").alias("h"),
    )
    px = decode_jpeg_color_pixels(attach_jpeg_color_image(docs))
    orig = (
        F.col("doc_id") * 7 + F.col("y") * 31 + F.col("x") * 5
        + F.col("c") * 11
    ) % 256
    corner_r = F.max(
        F.when(
            (F.col("y") == F.col("h") - 1)
            & (F.col("x") == F.col("w") - 1)
            & (F.col("c") == 0),
            F.col("recon"),
        )
    )
    return (
        px.join(F.broadcast(dims), "doc_id")
        .groupBy("doc_id", "w", "h")
        .agg(
            F.sum("recon").cast("long").alias("recon_sum"),
            F.sum(F.abs(F.col("recon") - orig)).cast("long").alias(
                "err_abs_sum"
            ),
            corner_r.cast("int").alias("corner_r"),
        )
        .select(
            "doc_id",
            F.col("w").cast("int").alias("width"),
            F.col("h").cast("int").alias("height"),
            F.expr("CAST(w div 16 AS INT)").alias("n_mcus"),
            "recon_sum",
            "err_abs_sum",
            "corner_r",
        )
        .orderBy("doc_id")
    )
