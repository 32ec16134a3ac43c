"""Approximate-nearest-neighbor search over an embedding column.

* ``cosine_topk``      — exact brute force, but BLOCKED: the query matrix
  is broadcast once, each partition does ONE numpy matmul per Arrow batch
  and keeps only its local top-k (mapInPandas), then a global
  TakeOrderedAndProject finishes.  This is the correct 100 TB shape for
  exact search: no crossJoin row explosion, no full similarity
  materialization — shuffle size is O(partitions · queries · k).
* ``lsh_cosine_topk``  — random-hyperplane LSH (sign sketch, deterministic
  seed): bucket by the b-bit code, search only colliding buckets (with
  multi-probe on 1-bit flips), exact rerank inside candidates.  Recall<1
  by construction; the scale path when even one matmul pass is too much.
* ``ivf_cosine_topk``  — inverted-file index (IVF-flat): k-means coarse
  quantizer trained driver-side on a bounded sample (deterministic
  seed), vectors assigned to their nearest centroid's list, queries
  search only the ``nprobe`` nearest lists with exact rerank inside.
  The standard beyond-matmul ANN shape (Jegou et al., public
  literature): scan fraction ~= nprobe/nlist, recall tunable by nprobe.

The oracle-matched DataFrame variant lives in queries.q_ann_cosine (same
math, crossJoin form, verifiable in DuckDB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _collect_queries(queries: DataFrame, id_col: str,
                     vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    rows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    qm = np.array([r[1] for r in rows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    return qids, qm


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_self: bool = True) -> DataFrame:
    """Exact blocked brute-force -> (qid, rank, vec_id, cosine)."""
    spark = emb.sparkSession
    qids, qm = _collect_queries(queries, id_col, vec_col)
    bc = spark.sparkContext.broadcast((qids, qm))

    def part(batches):
        qids_b, qm_b = bc.value
        best: list[tuple] = []
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sims = qm_b @ m.T  # (Q, batch)
            for qi in range(len(qids_b)):
                s = sims[qi]
                if exclude_self:
                    s = np.where(ids == qids_b[qi], -np.inf, s)
                top = np.argpartition(-s, min(k, s.size - 1))[:k]
                for j in top:
                    if np.isfinite(s[j]):
                        best.append((int(qids_b[qi]), int(ids[j]),
                                     float(s[j])))
        yield pd.DataFrame(best, columns=["qid", "vec_id", "cosine"])

    from ..plans.parallel import spread_input
    local = spread_input(emb).mapInPandas(
        part, schema="qid long, vec_id long, cosine double")
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (local.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "vec_id", F.round("cosine", 6).alias("cosine")))


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_codes(emb: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", bits: int = 16,
              seed: int = 42, dim: int = 64) -> DataFrame:
    """(vec_id, code) — sign sketch under fixed random hyperplanes."""
    spark = emb.sparkSession
    planes = spark.sparkContext.broadcast(_hyperplanes(dim, bits, seed))

    def gen(batches):
        h = planes.value
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            signs = (m @ h.T) > 0
            codes = np.zeros(len(pdf), dtype=np.int64)
            for b in range(signs.shape[1]):
                codes |= signs[:, b].astype(np.int64) << b
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(),
                                "code": codes})

    from ..plans.parallel import spread_input
    return spread_input(emb.select(id_col, vec_col)).mapInPandas(
        gen, schema="vec_id long, code long")


def lsh_cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    bits: int = 12, seed: int = 42, dim: int = 64,
                    probe_flips: int = 1) -> DataFrame:
    """Bucketed ANN: candidates = vectors sharing the query's LSH code or
    any 1-bit-flip neighbor code (multi-probe), exact rerank inside.

    Returns (qid, rank, vec_id, cosine) — approximate: recall depends on
    bits/probes (tested against cosine_topk in tests/test_dedup_ann.py).
    """
    spark = emb.sparkSession
    codes = lsh_codes(emb, id_col, vec_col, bits, seed, dim)
    with_codes = emb.join(codes, emb[id_col] == codes["vec_id"]) \
                    .select(emb[id_col].alias("vid"), vec_col, "code")
    qids, qm = _collect_queries(queries, id_col, vec_col)
    planes = _hyperplanes(dim, bits, seed)
    signs = (qm @ planes.T) > 0
    probe_rows = []
    for qi, qid in enumerate(qids):
        base = 0
        for b in range(bits):
            base |= int(signs[qi, b]) << b
        probes = {base}
        if probe_flips >= 1:
            probes |= {base ^ (1 << b) for b in range(bits)}
        if probe_flips >= 2:
            probes |= {base ^ (1 << b1) ^ (1 << b2)
                       for b1 in range(bits) for b2 in range(b1 + 1, bits)}
        for c in sorted(probes):
            probe_rows.append((int(qid), c))
    probe_df = spark.createDataFrame(probe_rows, "qid long, code long")
    cand = with_codes.join(F.broadcast(probe_df), "code") \
                     .filter(F.col("vid") != F.col("qid"))
    qvec = spark.createDataFrame(
        [(int(q), qm[i].tolist()) for i, q in enumerate(qids)],
        f"qid long, qv array<double>")
    dot = F.aggregate(F.zip_with(F.col("qv"), F.col(vec_col),
                                 lambda x, y: x * y.cast("double")),
                      F.lit(0.0), lambda a, x: a + x)
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x),
        F.lit(0.0), lambda a, x: a + x))
    scored = (cand.join(F.broadcast(qvec), "qid")
              .select("qid", F.col("vid").alias("vec_id"),
                      (dot / nrm).alias("cosine")))
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "vec_id", F.round("cosine", 6).alias("cosine")))


# ------------------------------------------------------------------ IVF

def _kmeans(sample: np.ndarray, nlist: int, seed: int = 42,
            iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means on the DRIVER over a bounded
    sample (the coarse quantizer is tiny: nlist x dim floats).  Vectors
    and centroids are L2-normalized so argmax-dot == argmin-angle."""
    rng = np.random.default_rng(seed)
    s = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True),
                            1e-30)
    cent = s[rng.choice(len(s), size=min(nlist, len(s)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(s @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = s[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def ivf_assign(emb: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(vec_id, list_id) — nearest-centroid assignment, one matmul per
    Arrow batch.  At build time this runs ONCE over the corpus; the
    output is the partition/bucketing key for the vector table."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def gen(batches):
        cent = bc.value
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            yield pd.DataFrame({
                "vec_id": pdf[id_col].to_numpy(),
                "list_id": np.argmax(m @ cent.T, axis=1).astype(np.int64)})

    from ..plans.parallel import spread_input
    return spread_input(emb.select(id_col, vec_col)).mapInPandas(
        gen, schema="vec_id long, list_id long")


class IVFIndex:
    """Built IVF-flat index: coarse quantizer (nlist x dim centroids,
    driver-side) + the assigned vector table, materialized ONCE
    (localCheckpoint — reused by every query call, GC-released when the
    index object is dropped).  Build once / query many, the same
    lifecycle split as FulltextIndex."""

    def __init__(self, centroids: np.ndarray, with_lists: DataFrame,
                 vec_col: str):
        self.centroids = centroids
        self.with_lists = with_lists
        self.vec_col = vec_col


def ivf_build(emb: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", nlist: int = 16, seed: int = 42,
              train_cap: int = 50_000) -> IVFIndex | None:
    """Train the coarse quantizer and assign every vector to its list.

    The training sample is drawn CORPUS-WIDE and deterministically:
    orderBy(xxhash64(id)) + limit plans as TakeOrderedAndProject
    (per-partition top-cap, merged on the driver — no global sort), and
    hash order is pseudo-random, so the sample covers every shard's
    distribution instead of whatever partitions happen to scan first
    (``limit`` alone takes the first partitions — skewed centroids and
    recall collapse at scale) and is identical at any partitioning.
    Returns None on an empty corpus."""
    sample = np.array(
        [r[0] for r in emb.select(vec_col)
         .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
         .limit(train_cap).collect()], dtype=np.float64)
    if sample.size == 0:
        return None
    cent = _kmeans(sample, nlist, seed)
    assigned = ivf_assign(emb, cent, id_col, vec_col)
    with_lists = (emb.join(assigned, emb[id_col] == assigned["vec_id"])
                  .select(assigned["vec_id"].alias("vid"), vec_col,
                          "list_id")
                  .localCheckpoint(eager=False))
    return IVFIndex(cent, with_lists, vec_col)


def ivf_query(index: IVFIndex, queries: DataFrame, k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding",
              nprobe: int = 4) -> DataFrame:
    """Query a built IVFIndex -> (qid, rank, vec_id, cosine): each query
    scans only its ``nprobe`` nearest lists (broadcast (qid, list_id)
    probe table -> hash join -> exact rerank inside candidates).
    Expected scanned fraction ~= nprobe/nlist."""
    spark = index.with_lists.sparkSession
    cent = index.centroids
    with_lists = index.with_lists
    qids, qm = _collect_queries(queries, id_col, vec_col)
    probe_lists = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    probe_df = spark.createDataFrame(
        [(int(q), int(l)) for i, q in enumerate(qids)
         for l in probe_lists[i]], "qid long, list_id long")
    cand = with_lists.join(F.broadcast(probe_df), "list_id") \
                     .filter(F.col("vid") != F.col("qid"))
    qvec = spark.createDataFrame(
        [(int(q), qm[i].tolist()) for i, q in enumerate(qids)],
        "qid long, qv array<double>")
    vcol = index.vec_col  # candidate side keeps the build-time column name
    dot = F.aggregate(F.zip_with(F.col("qv"), F.col(vcol),
                                 lambda x, y: x * y.cast("double")),
                      F.lit(0.0), lambda a, x: a + x)
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col(vcol), lambda x: x.cast("double") * x),
        F.lit(0.0), lambda a, x: a + x))
    scored = (cand.join(F.broadcast(qvec), "qid")
              .select("qid", F.col("vid").alias("vec_id"),
                      (dot / nrm).alias("cosine")))
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "vec_id",
                    F.round("cosine", 6).alias("cosine")))


def ivf_cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    nlist: int = 16, nprobe: int = 4, seed: int = 42,
                    train_cap: int = 50_000) -> DataFrame:
    """One-shot convenience: ivf_build + ivf_query.  Callers issuing
    multiple query batches should build once (``ivf_build``) and query
    many — the assigned table is materialized once per index, not per
    call.  Empty corpus -> empty result."""
    index = ivf_build(emb, id_col, vec_col, nlist, seed, train_cap)
    if index is None:
        return emb.sparkSession.createDataFrame(
            [], "qid long, rank long, vec_id long, cosine double")
    return ivf_query(index, queries, k, id_col, vec_col, nprobe)
