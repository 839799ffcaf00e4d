"""Independent pandas re-implementations of the reference semantics.

These mirror the behavior documented in SURVEY.md §2.6/§2.7 (and the
reference cleaner/transformer) so the Spark operators can be tested
differentially. They intentionally use pandas idioms — including its
NaN-comparison and ``.loc``-assignment quirks — because that IS the
semantics being checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

REQ_COLS = [
    "crash_record_id", "beat_of_occurrence", "crash_date", "crash_day_of_week",
    "crash_hour", "crash_type", "hit_and_run_i", "num_units", "injuries_total",
    "lighting_condition", "latitude", "longitude", "posted_speed_limit",
    "road_defect", "roadway_surface_cond", "street_direction", "trafficway_type",
    "weather_condition", "intersection_related_i", "traffic_control_device",
    "work_zone_i", "private_property_i",
]
BOOL_COLS = ["hit_and_run_i", "intersection_related_i", "private_property_i", "work_zone_i"]
NUMERIC_INPUT = [
    "posted_speed_limit", "beat_of_occurrence", "num_units", "injuries_total",
    "crash_hour", "crash_day_of_week", "latitude", "longitude",
]


def clean_oracle(bronze: pd.DataFrame) -> pd.DataFrame:
    df = bronze.copy()
    existing = [c for c in REQ_COLS if c in df.columns]
    add = [c for c in REQ_COLS if c not in df.columns]
    df = df[existing].copy()
    for c in add:
        df[c] = None
    for c in NUMERIC_INPUT:
        df[c] = pd.to_numeric(df[c])

    def std_bool(v):
        if pd.isna(v):
            return 0
        return 1 if str(v).strip().lower() in ["y", "yes", "true", "t", "1", "1.0"] else 0

    for c in BOOL_COLS:
        df[c] = df[c].apply(std_bool).astype("int64")

    df["is_weekend"] = df["crash_day_of_week"].apply(lambda v: 1 if (v == 1 or v == 7) else 0)

    def hour_bin(v):
        if v <= 6:
            return "night"
        elif v <= 12:
            return "morning"
        elif v <= 18:
            return "afternoon"
        elif v <= 23:
            return "evening"
        return None

    df["hour_bin"] = df["crash_hour"].apply(hour_bin)

    df = df.dropna(subset=["crash_date"])
    df["crash_date"] = pd.to_datetime(df["crash_date"], format="mixed").dt.normalize()

    invalid = (
        ((df["latitude"] == 0) & (df["longitude"] == 0))
        | (df["latitude"] < 41.6)
        | (df["latitude"] > 42.1)
        | (df["longitude"] < -88.0)
        | (df["longitude"] > -87.5)
    )
    df = df[~invalid].copy()

    df["lat_bin"] = df["latitude"].round(2)
    df["lng_bin"] = df["longitude"].round(2)
    df["grid_id"] = df["lat_bin"].astype(str) + "_" + df["lng_bin"].astype(str)

    recodes = {
        "roadway_surface_cond": ["DRY", "UNKNOWN", "WET", "SNOW OR SLUSH", "ICE"],
        "lighting_condition": ["DARKNESS, LIGHTED ROAD", "UNKNOWN", "DARKNESS", "DAWN", "DAYLIGHT", "DUSK"],
        "traffic_control_device": ["NO CONTROLS", "TRAFFIC SIGNAL", "STOP SIGN/FLASHER", "UNKNOWN"],
        "crash_type": ["NO INJURY / DRIVE AWAY", "INJURY AND / OR TOW DUE TO CRASH"],
    }
    for col, wl in recodes.items():
        df[col] = df[col].str.upper()
        df.loc[~df[col].isin(wl), col] = "OTHER"

    df["weather_condition"] = df["weather_condition"].str.upper()
    snow = ["SNOW", "BLOWING SNOW", "SLEET/HAIL", "FREEZING RAIN/DRIZZLE"]
    df.loc[df["weather_condition"].isin(snow), "weather_condition"] = "SNOW"
    df.loc[~df["weather_condition"].isin(["CLOUDY/OVERCAST", "CLEAR", "RAIN", "SNOW"]), "weather_condition"] = "OTHER"

    df["injuries_total"] = df["injuries_total"].fillna(0)

    numeric_cols = df.select_dtypes(include=["float64", "int64"]).columns.tolist()
    numeric_cols = [
        c
        for c in numeric_cols
        if c
        not in [
            "crash_record_id", "injuries_total", "hit_and_run_i",
            "intersection_related_i", "private_property_i", "work_zone_i", "is_weekend",
        ]
    ]
    for c in numeric_cols:
        if df[c].isna().sum() > 0:
            df[c] = df[c].fillna(df[c].median())

    for c in df.select_dtypes(include=["object"]).columns:
        if c != "crash_record_id" and df[c].isna().sum() > 0:
            df[c] = df[c].fillna("OTHER")

    df.loc[df["num_units"] > 10, "num_units"] = 10
    df.loc[df["posted_speed_limit"] > 75, "posted_speed_limit"] = 75

    # Gold typing (duckdb_writer DDL): DOUBLE→INTEGER rounds half-even
    for c in ["crash_day_of_week", "crash_hour", "beat_of_occurrence", "num_units", "posted_speed_limit"]:
        df[c] = np.round(df[c].astype("float64")).astype("Int64")
    return df


def transform_oracle(
    crashes: pd.DataFrame, vehicles: pd.DataFrame | None, people: pd.DataFrame | None
) -> pd.DataFrame:
    """Silver merge semantics (transformer.py:201-258) in pandas."""

    def std(df):
        df = df.rename(columns={c: c.strip().lower() for c in df.columns})
        return df.drop_duplicates(keep="first")

    def agg(df, prefix):
        id_col = "crash_record_id"
        text_cols = [c for c in df.columns if c != id_col][:5]
        g = df.groupby(id_col, sort=False)
        out = g.size().rename(f"{prefix}_count").to_frame()
        for c in text_cols:
            out[f"{prefix}_{c}_list"] = g[c].apply(
                lambda s: sorted(set(x for x in s if pd.notna(x)))
            )
        return out.reset_index()

    out = std(crashes)
    for df, prefix in ((vehicles, "veh"), (people, "ppl")):
        if df is None:
            continue
        side = std(df)
        if "crash_record_id" not in side.columns:
            continue
        out = out.merge(agg(side, prefix), on="crash_record_id", how="left")
    return out.drop_duplicates(subset=["crash_record_id"], keep="first")
