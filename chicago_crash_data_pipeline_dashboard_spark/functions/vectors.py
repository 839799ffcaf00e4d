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


def let(value: Column, body) -> Column:
    """Bind ``value`` once per row (Catalyst has no let-binding and
    re-evaluates sub-expressions referenced inside higher-order lambdas
    per element): ``transform(array(value), v -> body(v))[0]``."""
    return F.transform(F.array(value), body)[0]


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (driver-side
    constants, broadcast into the plan as literals)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection signature: one bit per hyperplane, packed
    into a long. 2 planes ⇒ 4 buckets, n ⇒ 2^n buckets.

    The plane matrix enters the plan as ONE constant-folded
    ``from_json`` literal and the per-plane projection is a HOF loop —
    a handful of expression nodes instead of n_planes × dim scalar
    literals (which cost ~1 s of py4j driver time per query to build).
    Projection values are bit-identical to the unrolled form (same
    sequential fold over the same doubles)."""
    import json

    planes_lit = F.from_json(
        F.lit(json.dumps([[float(w) for w in p] for p in planes])),
        "array<array<double>>",
    )
    pows = F.lit([1 << i for i in range(len(planes))])
    projs = F.transform(
        planes_lit,
        lambda p: F.aggregate(
            F.zip_with(_d(vec), p, lambda x, w: x * w), F.lit(0.0), lambda acc, x: acc + x
        ),
    )
    return F.aggregate(
        F.zip_with(
            projs,
            pows,
            lambda pr, w: F.when(pr >= 0, w).otherwise(F.lit(0)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
