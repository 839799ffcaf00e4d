"""Similarity search over embedding columns (array<float>).

Two paths, same API:

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Queries are broadcast (they're top-k *requests*, inherently small);
  the corpus streams through one narrow pass; per-query top-k via
  window row_number. No corpus shuffle at all when queries broadcast.
- ``lsh_topk``: sign-LSH bucketed ANN — the 100 TB path. Corpus is
  bucketed once (signature = narrow map); a query probes its own
  bucket plus multi-probe neighbors (Hamming-1 flips), exact-reranks
  in-bucket. Recall tunes with n_planes / probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions import vectors as VX


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k: for each query vector, the k nearest corpus vectors
    by cosine (self-matches excluded). Deterministic tie-break on
    (cosine desc, neighbor id asc)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        VX.norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        VX.norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                VX.cosine_with_norms(
                    F.col("cvec"), F.col("qvec"), F.col("cn"), F.col("qn")
                ),
                6,
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def _flip_signatures(sig_col, n_planes: int):
    """The signature plus its Hamming-1 neighbors (multi-probe)."""
    return F.array(sig_col, *[sig_col.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing the
    query's LSH bucket (± Hamming-1 probes), exact cosine rerank."""
    planes = VX.random_hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        VX.norm(F.col(vec_col)).alias("cn"),
        VX.lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        VX.norm(F.col(vec_col)).alias("qn"),
        VX.lsh_signature(F.col(vec_col), planes).alias("qsig"),
    )
    if multi_probe:
        q = q.select(
            "query_id", "qvec", "qn",
            F.explode(_flip_signatures(F.col("qsig"), n_planes)).alias("bucket"),
        )
    else:
        q = q.withColumnRenamed("qsig", "bucket")

    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                VX.cosine_with_norms(
                    F.col("cvec"), F.col("qvec"), F.col("cn"), F.col("qn")
                ),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cos")
        .distinct()  # multi-probe can hit the same pair via two buckets
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
):
    """IVF coarse quantizer: k-means over the corpus; returns the
    cluster-assigned corpus and the centroid list.

    At 100 TB: fit on a sample, assign in one narrow map, and write the
    corpus PARTITIONED by cluster id — each probe then reads only its
    clusters' files (partition pruning = the inverted file)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("_fv")
    )
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="_fv", predictionCol="_cluster"
    ).fit(feat)
    assigned = model.transform(feat).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        VX.norm(F.col(vec_col)).alias("cn"),
        F.col("_cluster"),
    )
    return assigned, model.clusterCenters()


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest centroids
    per query, exact cosine rerank within the probed clusters. Recall
    tunes with n_probe/n_clusters; the corpus-side work is one k-means
    assignment plus a bucket join (no all-pairs scan)."""
    assigned, centroids = ivf_index(corpus, id_col, vec_col, n_clusters, seed)

    # (cluster, L2-to-centroid) structs → sort by distance → first n_probe
    cents = F.array(
        *[
            F.struct(
                VX.l2_distance(
                    F.col(vec_col), F.array(*[F.lit(float(x)) for x in c])
                ).alias("d"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probes = F.transform(F.slice(F.array_sort(cents), 1, n_probe), lambda s: s["c"])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        VX.norm(F.col(vec_col)).alias("qn"),
        F.explode(probes).alias("_cluster"),
    )
    scored = (
        assigned.join(F.broadcast(q), "_cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                VX.cosine_with_norms(
                    F.col("cvec"), F.col("qvec"), F.col("cn"), F.col("qn")
                ),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cos")
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )
