"""Column-expression builders for the Gold cleaning chain.

Each function returns a pyspark Column (no UDFs — everything stays in
whole-stage codegen). Semantics match the reference cleaner rule by
rule (citations point into /root/reference; SURVEY.md §2.6), including
the §4.3 null/rounding traps:

- boolean standardization maps null → 0 (pandas ``pd.isna → 0``);
- the bounding-box predicate is null-safe (pandas NaN comparisons are
  False, so null-coordinate rows SURVIVE the filter);
- lat/lng binning uses ``bround`` (numpy half-even), not ``round``;
- ``grid_id`` stringifies null bins as ``'nan'`` (Python ``str(NaN)``);
- whitelist recodes send null to ``'OTHER'`` (pandas ``.loc[~isin]``
  assignment hits NaN rows too).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import (
    CRASH_TYPE_WHITELIST,
    LAT_MAX,
    LAT_MIN,
    LIGHTING_WHITELIST,
    LNG_MAX,
    LNG_MIN,
    ROADWAY_SURFACE_WHITELIST,
    TRAFFIC_CONTROL_WHITELIST,
    WEATHER_SNOW_GROUP,
    WEATHER_WHITELIST,
)

# truthy tokens for boolean standardization (cleaning_rules.py:74)
_TRUTHY = ["y", "yes", "true", "t", "1", "1.0"]


def standardize_boolean(col: Column) -> Column:
    """F3 (cleaning_rules.py:57-88): Y/yes/true/t/1/1.0 (any case, padded)
    → 1; everything else INCLUDING null → 0.

    Padding is stripped with a whitespace-class regex, not ``F.trim``:
    the reference strips via pandas ``.str.strip()`` (all whitespace,
    unicode included — hence ``(?U)``), while Spark/DuckDB ``trim``
    removes ASCII spaces only, which would misclassify ``'1\\t'``
    (property-tested in tests/test_properties.py)."""
    norm = F.lower(F.regexp_replace(col.cast("string"), r"(?U)^\s+|\s+$", ""))
    return F.when(norm.isin(_TRUTHY), F.lit(1)).otherwise(F.lit(0)).cast("int")


def is_weekend(day_of_week: Column) -> Column:
    """F4 (cleaning_rules.py:92-97): Socrata Sun=1/Sat=7 → 1 else 0
    (null → 0, matching the pandas else-branch)."""
    return F.when(day_of_week.isin(1, 7), F.lit(1)).otherwise(F.lit(0)).cast("int")


def hour_bin(hour: Column) -> Column:
    """F5 (cleaning_rules.py:100-112): ≤6 night, ≤12 morning, ≤18
    afternoon, ≤23 evening, else null. Null input fails every ≤ in
    pandas → None; Spark's when-chain gives the same null."""
    return (
        F.when(hour <= 6, "night")
        .when(hour <= 12, "morning")
        .when(hour <= 18, "afternoon")
        .when(hour <= 23, "evening")
        .otherwise(F.lit(None).cast("string"))
    )


def normalize_crash_date(col: Column) -> Column:
    """F6 (cleaning_rules.py:119): parse timestamp (with or without
    millis), truncate to day → DATE."""
    return F.to_date(F.to_timestamp(col))


def invalid_coords(lat: Column, lng: Column) -> Column:
    """P4 (cleaning_rules.py:128-143): the *invalid* predicate.

    (0,0) OR outside the Chicago box. Null coordinates must NOT count
    as invalid (pandas NaN compares False everywhere), hence the
    coalesce-to-false wrap — a naive Spark `~pred` would turn NULL
    into NULL and drop those rows.
    """
    pred = (
        ((lat == 0) & (lng == 0))
        | (lat < LAT_MIN)
        | (lat > LAT_MAX)
        | (lng < LNG_MIN)
        | (lng > LNG_MAX)
    )
    return F.coalesce(pred, F.lit(False))


def coord_bin(col: Column) -> Column:
    """F8 (cleaning_rules.py:146-147): round to 2 decimals with
    HALF_EVEN (numpy banker's rounding) — Spark ``bround``."""
    return F.bround(col, 2)


def grid_id(lat_bin: Column, lng_bin: Column) -> Column:
    """F9 (cleaning_rules.py:150): ``str(lat_bin) + '_' + str(lng_bin)``.

    Python ``str()`` of a float NaN is ``'nan'`` — the reference
    computes grid_id BEFORE median imputation, so null-coordinate rows
    carry grid_id ``'nan_nan'`` forever. Reproduced via coalesce.
    """
    return F.concat_ws(
        "_",
        F.coalesce(lat_bin.cast("string"), F.lit("nan")),
        F.coalesce(lng_bin.cast("string"), F.lit("nan")),
    )


def whitelist_recode(col: Column, whitelist: list[str]) -> Column:
    """F10 (cleaning_rules.py:153-181): uppercase; keep whitelisted
    values, everything else INCLUDING null → 'OTHER' (pandas
    ``.loc[~isin] = 'OTHER'`` rewrites NaN rows as well)."""
    up = F.upper(col)
    return F.when(up.isin(whitelist), up).otherwise(F.lit("OTHER"))


def weather_recode(col: Column) -> Column:
    """F11 (cleaning_rules.py:163-171): two-step — snow-family → SNOW,
    then whitelist-else-OTHER."""
    up = F.upper(col)
    merged = F.when(up.isin(WEATHER_SNOW_GROUP), F.lit("SNOW")).otherwise(up)
    return F.when(merged.isin(WEATHER_WHITELIST), merged).otherwise(F.lit("OTHER"))


def roadway_surface_recode(col: Column) -> Column:
    return whitelist_recode(col, ROADWAY_SURFACE_WHITELIST)


def lighting_recode(col: Column) -> Column:
    return whitelist_recode(col, LIGHTING_WHITELIST)


def traffic_control_recode(col: Column) -> Column:
    return whitelist_recode(col, TRAFFIC_CONTROL_WHITELIST)


def crash_type_recode(col: Column) -> Column:
    return whitelist_recode(col, CRASH_TYPE_WHITELIST)


def cap(col: Column, cap_value: int) -> Column:
    """F15 (cleaning_rules.py:219-222): values above the cap are set to
    the cap; nulls pass through (pandas ``.loc[col > cap]`` skips NaN)."""
    return F.when(col > cap_value, F.lit(cap_value)).otherwise(col)


def dict_map(col: Column, mapping: dict, default=None) -> Column:
    """F16 (streamlit_frontend.py:1015 etc.): pandas ``.map(dict)`` —
    unmapped keys → null (or ``default``)."""
    expr = None
    for k, v in mapping.items():
        cond = col == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default))


def pct(part: Column, total: Column) -> Column:
    """F22: percentage derivation."""
    return part / total * 100.0


# --- F16: the dashboard's dict-map recodes (streamlit_frontend.py) -------

_DAY_LABELS_0_6 = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]


def day_label_eda(day_of_week: Column) -> Column:
    """F16 (streamlit_frontend.py:1174-1243): the EDA tab maps
    ``{0:'Sun', …, 6:'Sat'}`` — but the data is Socrata 1-7 (Sun=1).
    Day 7 has no key and maps to null, and every label is shifted by
    one. REPRODUCED AS-IS for fidelity (SURVEY §4.3 flags it as a
    reference bug; parity beats correction here)."""
    expr = F.when(F.lit(False), F.lit(None).cast("string"))
    for k, label in enumerate(_DAY_LABELS_0_6):
        expr = expr.when(day_of_week == k, F.lit(label))
    return expr.otherwise(F.lit(None).cast("string"))


def yes_no_label(flag: Column) -> Column:
    """F16 (streamlit_frontend.py:1015): ``{0:'No', 1:'Yes'}``; other
    values (and null) → null, like a pandas .map miss."""
    return F.when(flag == 0, "No").when(flag == 1, "Yes").otherwise(F.lit(None).cast("string"))
