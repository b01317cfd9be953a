"""Golden micro-fixture tests ported from the reference's notebooks
(FIXTURES.md §1-2): the de-facto test inputs of
``notebooks/development.ipynb`` cells 3 and 6, with hand-derivable outputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from apache_beam_challange_spark.functions.geo import haversine_km
from apache_beam_challange_spark.operators.joins import all_pairs
from apache_beam_challange_spark.operators.relational import (
    drop_null_rows,
    group_count,
    top_k,
)

RIDES_SCHEMA = StructType(
    [
        StructField("start_station_name", StringType(), True),
        StructField("end_station_name", StringType(), True),
    ]
)

# notebooks/development.ipynb:305-317 (cell 3)
RIDE_ROWS = [
    ("Harper Road, The Borough", "Harper Road, The Borough"),
    ("Harper Road, The Borough", "Wellington Arch, Hyde Park"),
    ("Golden Square, Soho", "Albert Gate, Hyde Park"),
    ("Golden Square, Soho", "Albert Gate, Hyde Park"),
    ("Embankment (Savoy), Strand", "Albert Gate, Hyde Park"),
    ("Green Park Station, Mayfair", "Chepstow Villas, Notting Hill"),
    ("Green Park Station, Mayfair", "Chepstow Villas, Notting Hill"),
    ("Green Park Station, Mayfair", "Chepstow Villas, Notting Hill"),
]

# notebooks/development.ipynb:653-656 (cell 6)
STATION_ROWS = [
    (51.49859784, -0.096191134, "Harper Road, The Borough"),
    (51.50274025, -0.149569201, "Wellington Arch, Hyde Park"),
]
STATIONS_SCHEMA = StructType(
    [
        StructField("latitude", DoubleType(), True),
        StructField("longitude", DoubleType(), True),
        StructField("name", StringType(), True),
    ]
)


def test_group_count_golden(spark):
    """Q2 core on the 8-ride fixture: counts 3 / 2 / 1,1,1."""
    rides = spark.createDataFrame(RIDE_ROWS, RIDES_SCHEMA)
    counts = group_count(
        rides, ["start_station_name", "end_station_name"], alias="n"
    )
    got = {
        (r["start_station_name"], r["end_station_name"]): r["n"]
        for r in counts.collect()
    }
    assert got[("Green Park Station, Mayfair", "Chepstow Villas, Notting Hill")] == 3
    assert got[("Golden Square, Soho", "Albert Gate, Hyde Park")] == 2
    assert got[("Harper Road, The Borough", "Harper Road, The Borough")] == 1
    assert len(got) == 5


def test_null_variant_filtered(spark):
    """The None-containing variant (development copy.ipynb cell 10): null
    rows drop before counting."""
    rows = RIDE_ROWS + [
        ("Green Park Station, Mayfair", None),
        (None, "Chepstow Villas, Notting Hill"),
    ]
    rides = spark.createDataFrame(rows, RIDES_SCHEMA)
    filtered = drop_null_rows(rides)
    assert filtered.count() == 8
    counts = group_count(
        filtered, ["start_station_name", "end_station_name"], alias="n"
    )
    assert counts.count() == 5


def test_topk_with_tiebreak(spark):
    rides = spark.createDataFrame(RIDE_ROWS, RIDES_SCHEMA)
    counts = group_count(
        rides, ["start_station_name", "end_station_name"], alias="n"
    )
    top2 = top_k(
        counts,
        2,
        order=[F.col("n").desc()],
        tiebreak=("start_station_name", "end_station_name"),
    ).collect()
    assert top2[0]["n"] == 3 and top2[1]["n"] == 2


def test_station_distance_golden(spark):
    """Q3 on the 2-station fixture: 4 rows (both self-pairs at 0, the cross
    pair both ways at 3.723406 km haversine)."""
    stations = spark.createDataFrame(STATION_ROWS, STATIONS_SCHEMA)
    pairs = all_pairs(stations)
    out = pairs.select(
        "name_1",
        "name_2",
        F.round(
            haversine_km(
                F.col("latitude_1"),
                F.col("longitude_1"),
                F.col("latitude_2"),
                F.col("longitude_2"),
            ),
            6,
        ).alias("km"),
    ).collect()
    assert len(out) == 4
    by_pair = {(r["name_1"], r["name_2"]): r["km"] for r in out}
    assert by_pair[("Harper Road, The Borough", "Harper Road, The Borough")] == 0.0
    assert by_pair[
        ("Harper Road, The Borough", "Wellington Arch, Hyde Park")
    ] == pytest.approx(3.723406, abs=1e-6)
    assert by_pair[
        ("Wellington Arch, Hyde Park", "Harper Road, The Borough")
    ] == pytest.approx(3.723406, abs=1e-6)


def test_vincenty_golden_line():
    """Vincenty's published WGS-84 test line (Geoscience Australia):
    Flinders Peak -> Buninyong = 54 972.271 m."""
    import numpy as np

    from apache_beam_challange_spark.functions.geo import vincenty_km_np

    km = vincenty_km_np(
        np.array([-(37 + 57 / 60 + 3.72030 / 3600)]),
        np.array([144 + 25 / 60 + 29.52440 / 3600]),
        np.array([-(37 + 39 / 60 + 10.15610 / 3600)]),
        np.array([143 + 55 / 60 + 35.38390 / 3600]),
    )
    assert abs(km[0] - 54.972271) < 1e-5


def test_vincenty_degenerate_and_bound():
    import numpy as np

    from apache_beam_challange_spark.functions.geo import vincenty_km_np

    # identical points -> exactly 0
    assert vincenty_km_np(np.array([12.5]), np.array([7.0]),
                          np.array([12.5]), np.array([7.0]))[0] == 0.0
    # random-ish pairs: geodesic within 0.8% of haversine (mean-radius sphere)
    rng = np.random.RandomState(7)
    lat1, lat2 = rng.uniform(-80, 80, 50), rng.uniform(-80, 80, 50)
    lon1, lon2 = rng.uniform(-179, 179, 50), rng.uniform(-179, 179, 50)
    geo = vincenty_km_np(lat1, lon1, lat2, lon2)
    R = 6371.0088
    dlat, dlon = np.radians(lat2 - lat1), np.radians(lon2 - lon1)
    a = (np.sin(dlat / 2) ** 2
         + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2)) * np.sin(dlon / 2) ** 2)
    hav = 2 * R * np.arcsin(np.sqrt(a))
    ok = np.abs(geo - hav) <= np.maximum(hav * 0.008, 1e-6)
    assert ok.all()


def test_geopy_parity_when_available():
    """When geopy is importable the UDF routes through Karney; assert the
    in-repo Vincenty agrees to < 1 mm (skipped in codec-free containers)."""
    import numpy as np

    geopy = pytest.importorskip("geopy")  # noqa: F841
    from geopy.distance import geodesic

    from apache_beam_challange_spark.functions.geo import vincenty_km_np

    pts = [(-37.8, 144.9, 51.5, -0.1), (40.7, -74.0, 48.9, 2.3)]
    for la1, lo1, la2, lo2 in pts:
        v = vincenty_km_np(np.array([la1]), np.array([lo1]),
                           np.array([la2]), np.array([lo2]))[0]
        g = geodesic((la1, lo1), (la2, lo2)).kilometers
        assert abs(v - g) < 1e-6
