"""Vector column expressions over ``array<float>`` embedding columns.

Pure higher-order-function arithmetic (zip_with + aggregate) — stays
JVM-side; no UDF, no MLlib Vector conversion. Inputs are cast to
double before arithmetic so both engines (and both Spark codegen
paths) accumulate in float64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is 0."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_with_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from precomputed norms — compute ``norm()`` once per
    VECTOR (a narrow map before the pair join) instead of re-deriving
    both norms inside every pair expression: ~3× fewer array folds on
    the quadratic side. Bit-identical to ``cosine`` (same sqrt of the
    same sequential dot)."""
    denom = norm_a * norm_b
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_distance(a: Column, b: Column) -> Column:
    diff = F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (driver-side
    constants, broadcast into the plan as literals)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection signature: one bit per hyperplane, packed
    into a long. 2 planes ⇒ 4 buckets, n ⇒ 2^n buckets."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                _d(vec),
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return sig
