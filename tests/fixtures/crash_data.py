"""Deterministic crash-domain fixtures per FIXTURES.md.

Generates bronze-shaped (all-string) crashes/vehicles/people with every
edge case the cleaning/transform chains must survive: dup ids, null
dates, garbage booleans, (0,0)/out-of-box/null coordinates, >cap
outliers, unknown categories, day-of-week 7, mixed-case column names,
even-n medians. Seeded — identical across runs.
"""

from __future__ import annotations

import random

import pandas as pd

SEED = 42

WEATHER = [
    "CLEAR", "RAIN", "CLOUDY/OVERCAST", "SNOW", "BLOWING SNOW", "SLEET/HAIL",
    "FREEZING RAIN/DRIZZLE", "FOG/SMOKE/HAZE", "clear", "rain", None,
]
CRASH_TYPES = [
    "NO INJURY / DRIVE AWAY", "INJURY AND / OR TOW DUE TO CRASH",
    "no injury / drive away", "SOMETHING ELSE", None,
]
BOOLS = ["Y", "N", "y", "yes", "1", "1.0", "true", "T", "0", "no", "garbage", None]
LIGHTING = ["DAYLIGHT", "DARKNESS", "DARKNESS, LIGHTED ROAD", "DAWN", "DUSK", "UNKNOWN", "weird", None]
SURFACE = ["DRY", "WET", "SNOW OR SLUSH", "ICE", "UNKNOWN", "SAND, MUD, DIRT", "dry", None]
TRAFFIC = ["NO CONTROLS", "TRAFFIC SIGNAL", "STOP SIGN/FLASHER", "UNKNOWN", "RR CROSSING", None]
DEFECT = ["NO DEFECTS", "RUT, HOLES", "UNKNOWN", None]
DIRECTION = ["N", "S", "E", "W", None]
TRAFFICWAY = ["NOT DIVIDED", "FOUR WAY", "DIVIDED - W/MEDIAN BARRIER", "ONE-WAY", None]
MAKES = ["FORD", "TOYOTA", "HONDA", "CHEVROLET", "BMW", None]
UNIT_TYPES = ["DRIVER", "PARKED", "PEDESTRIAN", None]
PERSON_TYPES = ["DRIVER", "PASSENGER", "PEDESTRIAN", None]
INJURY = ["NO INDICATION OF INJURY", "NONINCAPACITATING INJURY", "FATAL", None]


def make_crashes(n: int = 600) -> pd.DataFrame:
    rng = random.Random(SEED)
    rows = []
    for i in range(n):
        rid = f"CRASH{i:06d}"
        year = rng.choice([2023, 2024, 2025])
        month, day = rng.randint(1, 12), rng.randint(1, 28)
        hh, mm, ss = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
        if rng.random() < 0.03:
            date = None  # tests P5 dropna
        elif rng.random() < 0.5:
            date = f"{year:04d}-{month:02d}-{day:02d}T{hh:02d}:{mm:02d}:{ss:02d}.000"
        else:
            date = f"{year:04d}-{month:02d}-{day:02d}T{hh:02d}:{mm:02d}:{ss:02d}"

        r = rng.random()
        if r < 0.05:
            lat, lng = "0", "0"  # (0,0) → dropped
        elif r < 0.10:
            lat, lng = str(rng.uniform(20, 40)), str(rng.uniform(-100, -90))  # out of box
        elif r < 0.18:
            lat, lng = None, None  # nulls SURVIVE the bbox filter
        else:
            lat = f"{rng.uniform(41.6, 42.1):.6f}"
            lng = f"{rng.uniform(-88.0, -87.5):.6f}"
            if rng.random() < 0.05:
                lat, lng = "41.745", "-87.705"  # half-even rounding cases
            if rng.random() < 0.05:
                lat, lng = "41.70", "-87.70"  # integral-ish repr cases

        rows.append(
            {
                "crash_record_id": rid,
                "crash_date": date,
                "crash_type": rng.choice(CRASH_TYPES),
                "posted_speed_limit": rng.choice(
                    [None, "0", "15", "25", "30", "35", "45", "55", "70", "99"]
                ),
                "weather_condition": rng.choice(WEATHER),
                "lane_cnt": rng.choice([None, "2", "4"]),
                "hit_and_run_i": rng.choice(BOOLS),
                "beat_of_occurrence": rng.choice([None, "111", "522", "1011", "1733", "2535"]),
                "num_units": rng.choice([None, "1", "2", "3", "12", "15"]),
                "injuries_total": rng.choice([None, "0", "1", "2", "5"]),
                "crash_hour": rng.choice([None] + [str(h) for h in range(24)]),
                "crash_day_of_week": rng.choice([None] + [str(d) for d in range(1, 8)]),
                "latitude": lat,
                "longitude": lng,
                "traffic_control_device": rng.choice(TRAFFIC),
                "work_zone_i": rng.choice(BOOLS),
                "work_zone_type": rng.choice([None, None, None, "CONSTRUCTION"]),
                "private_property_i": rng.choice(BOOLS),
                "lighting_condition": rng.choice(LIGHTING),
                "road_defect": rng.choice(DEFECT),
                "roadway_surface_cond": rng.choice(SURFACE),
                "street_direction": rng.choice(DIRECTION),
                "trafficway_type": rng.choice(TRAFFICWAY),
                "intersection_related_i": rng.choice(BOOLS),
            }
        )
    # ~2% duplicated ids with different payloads (tests W9 keep-first)
    dups = rng.sample(rows, max(1, n // 50))
    for d in dups:
        d2 = dict(d)
        d2["weather_condition"] = "RAIN"
        rows.append(d2)
    # a few null/empty ids
    for _ in range(3):
        r0 = dict(rng.choice(rows))
        r0["crash_record_id"] = None
        rows.append(r0)
    return pd.DataFrame(rows, dtype=object)


def make_vehicles(crash_ids: list[str], mixed_case: bool = True) -> pd.DataFrame:
    rng = random.Random(SEED + 1)
    rows = []
    for rid in crash_ids:
        for u in range(rng.randint(0, 4)):
            rows.append(
                {
                    "crash_record_id": rid,
                    "unit_no": str(u + 1),
                    "vehicle_id": f"V{rng.randint(1, 10 ** 6)}",
                    "unit_type": rng.choice(UNIT_TYPES),
                    "make": rng.choice(MAKES),
                    "model": rng.choice(["F150", "CAMRY", "CIVIC", None]),
                    "vehicle_year": rng.choice([None, "2005", "2015", "2020"]),
                    "travel_direction": rng.choice(DIRECTION),
                    "maneuver": rng.choice(["STRAIGHT AHEAD", "TURNING LEFT", None]),
                    "first_contact_point": rng.choice(["FRONT", "REAR", "SIDE", None]),
                    "vehicle_defect": rng.choice(["NONE", "BRAKES", None]),
                    "vehicle_use": rng.choice(["PERSONAL", "COMMERCIAL", None]),
                    "towed_i": rng.choice(BOOLS),
                }
            )
    # orphan vehicles (ids not in crashes)
    for i in range(5):
        r = dict(rows[i % len(rows)])
        r["crash_record_id"] = f"ORPHAN{i}"
        rows.append(r)
    # exact duplicate rows (tests W8)
    rows.extend(dict(r) for r in rows[:4])
    df = pd.DataFrame(rows, dtype=object)
    if mixed_case:
        df = df.rename(columns={"crash_record_id": "Crash_Record_ID", "make": " MAKE "})
    return df


def make_people(crash_ids: list[str]) -> pd.DataFrame:
    rng = random.Random(SEED + 2)
    rows = []
    for rid in crash_ids:
        for p in range(rng.randint(0, 6)):
            rows.append(
                {
                    "crash_record_id": rid,
                    "person_id": f"P{rng.randint(1, 10 ** 6)}",
                    "person_type": rng.choice(PERSON_TYPES),
                    "age": rng.choice([None, "17", "25", "40", "77"]),
                    "sex": rng.choice(["M", "F", "X", None]),
                    "seat_no": rng.choice([None, "1", "2", "3"]),
                    "injury_classification": rng.choice(INJURY),
                    "safety_equipment": rng.choice(["SEAT BELT USED", "NONE", None]),
                    "airbag_deployed": rng.choice(["DEPLOYED", "NOT DEPLOYED", None]),
                    "ejection": rng.choice(["NONE", "EJECTED", None]),
                }
            )
    return pd.DataFrame(rows, dtype=object)
