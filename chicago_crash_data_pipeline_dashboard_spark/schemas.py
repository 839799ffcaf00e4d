"""Explicit StructTypes for the three medallion layers.

Mirrors the reference data model (SURVEY.md §1):

- Bronze: all-string Socrata JSON rows (reference keeps every field as a
  JSON string; extractor/main.go:612-613). We pin an explicit all-string
  schema instead of relying on inference — deterministic and cheap at
  scale (no inference pass over 100 TB).
- Silver: standardized crash columns + per-crash aggregate columns from
  vehicles/people (transformer/transformer.py:207-258).
- Gold: typed 30-column table, DDL parity with
  cleaner/duckdb_writer.py:57-103.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- column dictionaries (SURVEY.md §1.4) --------------------------------

CRASH_COLUMNS = [
    "crash_record_id",
    "crash_date",
    "crash_type",
    "posted_speed_limit",
    "weather_condition",
    "lane_cnt",
    "hit_and_run_i",
    "beat_of_occurrence",
    "num_units",
    "injuries_total",
    "crash_hour",
    "crash_day_of_week",
    "latitude",
    "longitude",
    "traffic_control_device",
    "work_zone_i",
    "work_zone_type",
    "private_property_i",
    "lighting_condition",
    "road_defect",
    "roadway_surface_cond",
    "street_direction",
    "trafficway_type",
    "intersection_related_i",
]

VEHICLE_COLUMNS = [
    "crash_record_id",
    "unit_no",
    "vehicle_id",
    "unit_type",
    "make",
    "model",
    "vehicle_year",
    "travel_direction",
    "maneuver",
    "first_contact_point",
    "vehicle_defect",
    "vehicle_use",
    "towed_i",
]

PEOPLE_COLUMNS = [
    "crash_record_id",
    "person_id",
    "person_type",
    "age",
    "sex",
    "seat_no",
    "injury_classification",
    "safety_equipment",
    "airbag_deployed",
    "ejection",
]


def _all_string_schema(cols: list[str]) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType(), True) for c in cols])


BRONZE_CRASHES = _all_string_schema(CRASH_COLUMNS)
BRONZE_VEHICLES = _all_string_schema(VEHICLE_COLUMNS)
BRONZE_PEOPLE = _all_string_schema(PEOPLE_COLUMNS)

# --- Gold (cleaner/duckdb_writer.py:57-103 DDL parity) --------------------

GOLD_CRASHES = T.StructType(
    [
        T.StructField("crash_record_id", T.StringType(), False),
        T.StructField("crash_date", T.DateType(), True),
        T.StructField("crash_day_of_week", T.IntegerType(), True),
        T.StructField("crash_hour", T.IntegerType(), True),
        T.StructField("is_weekend", T.IntegerType(), True),
        T.StructField("hour_bin", T.StringType(), True),
        T.StructField("beat_of_occurrence", T.IntegerType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("lat_bin", T.DoubleType(), True),
        T.StructField("lng_bin", T.DoubleType(), True),
        T.StructField("grid_id", T.StringType(), True),
        T.StructField("crash_type", T.StringType(), True),
        T.StructField("num_units", T.IntegerType(), True),
        T.StructField("injuries_total", T.DoubleType(), True),
        T.StructField("lighting_condition", T.StringType(), True),
        T.StructField("posted_speed_limit", T.IntegerType(), True),
        T.StructField("road_defect", T.StringType(), True),
        T.StructField("roadway_surface_cond", T.StringType(), True),
        T.StructField("street_direction", T.StringType(), True),
        T.StructField("trafficway_type", T.StringType(), True),
        T.StructField("weather_condition", T.StringType(), True),
        T.StructField("traffic_control_device", T.StringType(), True),
        T.StructField("hit_and_run_i", T.IntegerType(), True),
        T.StructField("intersection_related_i", T.IntegerType(), True),
        T.StructField("work_zone_i", T.IntegerType(), True),
        T.StructField("private_property_i", T.IntegerType(), True),
        T.StructField("corr_id", T.StringType(), True),
        T.StructField("inserted_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

# Columns the Gold cleaning chain requires from Silver
# (cleaner/cleaning_rules.py:31-51 req_cols — the 22-column whitelist:
# CRASH_COLUMNS minus lane_cnt and work_zone_type, which are selected in
# Bronze but dropped at Gold).
GOLD_REQUIRED_INPUT_COLUMNS = [c for c in CRASH_COLUMNS if c not in ("lane_cnt", "work_zone_type")]

# Numeric Gold columns eligible for median imputation
# (cleaning_rules.py:192-202: every numeric col with nulls, except
# exclusions already handled — booleans were standardized to 0/1 and
# injuries_total was const-filled before this step runs).
MEDIAN_FILL_EXCLUDE = [
    "hit_and_run_i",
    "intersection_related_i",
    "private_property_i",
    "work_zone_i",
    "is_weekend",
    "injuries_total",
]

# Category whitelists (cleaning_rules.py:153-181)
ROADWAY_SURFACE_WHITELIST = ["DRY", "UNKNOWN", "WET", "SNOW OR SLUSH", "ICE"]
LIGHTING_WHITELIST = ["DARKNESS, LIGHTED ROAD", "UNKNOWN", "DARKNESS", "DAWN", "DAYLIGHT", "DUSK"]
TRAFFIC_CONTROL_WHITELIST = ["NO CONTROLS", "TRAFFIC SIGNAL", "STOP SIGN/FLASHER", "UNKNOWN"]
CRASH_TYPE_WHITELIST = ["NO INJURY / DRIVE AWAY", "INJURY AND / OR TOW DUE TO CRASH"]
WEATHER_SNOW_GROUP = ["SNOW", "BLOWING SNOW", "SLEET/HAIL", "FREEZING RAIN/DRIZZLE"]
WEATHER_WHITELIST = ["CLOUDY/OVERCAST", "CLEAR", "RAIN", "SNOW"]

# Outlier caps (cleaning_rules.py:219-222)
NUM_UNITS_CAP = 10
SPEED_LIMIT_CAP = 75

# Bounding box (cleaning_rules.py:128-143)
LAT_MIN, LAT_MAX = 41.6, 42.1
LNG_MIN, LNG_MAX = -88.0, -87.5
