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


def _fit_quantizer(sample, n_clusters: int, seed: int, max_iter: int = 20):
    """Seeded Lloyd k-means on a driver-side numpy sample (k-means++
    init). The coarse quantizer of an IVF index is ALWAYS trained on a
    bounded sample in production (FAISS-style) — the full corpus only
    flows through the one-pass assignment map, so no per-iteration
    distributed jobs exist at any scale."""
    import numpy as np

    x = np.asarray(sample, dtype=np.float64)
    rng = np.random.RandomState(seed)
    # k-means++ seeding
    centers = [x[rng.randint(len(x))]]
    for _ in range(1, n_clusters):
        d2 = np.min(
            ((x[:, None, :] - np.asarray(centers)[None, :, :]) ** 2).sum(-1), axis=1
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centers.append(x[rng.choice(len(x), p=probs)])
    c = np.asarray(centers)
    for _ in range(max_iter):
        assign = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(axis=1)
        new_c = np.array(
            [x[assign == j].mean(axis=0) if (assign == j).any() else c[j] for j in range(n_clusters)]
        )
        if np.allclose(new_c, c):
            break
        c = new_c
    return c


def _centroid_dists(vec_col, centroids):
    """L2 distance to every centroid as ONE array column.

    The centroid matrix enters the plan as ONE constant
    (``from_json`` of a string literal, constant-folded by Catalyst to
    an array<array<double>>) — not 16×64 scalar literal nodes, and not
    a py4j element-by-element transfer (a nested ``F.lit`` costs ~1 s
    of driver time for a 16×64 matrix; the JSON string is a single
    call). JSON round-trips doubles exactly (repr → correctly-rounded
    parse), and the distance loop is a HOF over the constant."""
    import json

    cents = F.from_json(
        F.lit(json.dumps([[float(x) for x in c] for c in centroids])),
        "array<array<double>>",
    )
    return F.transform(cents, lambda c: VX.l2_distance(vec_col, c))


def _nearest_centroid(vec_col, centroids) -> "F.Column":
    """argmin L2 over the centroid list (first index on ties)."""
    return VX.let(
        _centroid_dists(vec_col, centroids),
        lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int"),
    )


def _probe_clusters(vec_col, centroids, n_probe: int):
    """Indices of the ``n_probe`` nearest centroids, ties broken by
    cluster id (same ordering as sorting (distance, id) structs)."""
    k = len(centroids)

    def body(d):
        structs = F.zip_with(
            d,
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda dist, i: F.struct(dist.alias("d"), i.alias("c")),
        )
        return F.transform(F.slice(F.array_sort(structs), 1, n_probe), lambda s: s["c"])

    return VX.let(_centroid_dists(vec_col, centroids), body)


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
    train_sample: int = 65536,
):
    """IVF coarse quantizer: seeded k-means centroids fit on a bounded
    driver-side sample, then ONE narrow assignment map over the corpus
    (no iterative distributed jobs). Returns the cluster-assigned
    corpus and the centroid list.

    At 100 TB: the sample cap keeps quantizer training O(sample);
    assignment stays a narrow map; write the corpus PARTITIONED by
    cluster id — each probe then reads only its clusters' files
    (partition pruning = the inverted file)."""
    n = corpus.count()
    frac = min(1.0, train_sample / max(n, 1))
    sample_df = corpus.sample(fraction=frac, seed=seed) if frac < 1.0 else corpus
    sample = [r[0] for r in sample_df.select(vec_col).collect()]
    centroids = _fit_quantizer(sample, n_clusters, seed)

    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        VX.norm(F.col(vec_col)).alias("cn"),
        _nearest_centroid(F.col(vec_col), centroids).alias("_cluster"),
    )
    return assigned, centroids


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

    probes = _probe_clusters(F.col(vec_col), centroids, n_probe)
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
