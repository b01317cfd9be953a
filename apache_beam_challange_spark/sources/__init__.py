from apache_beam_challange_spark.sources.catalog import (
    BASE_TABLES,
    RIDES_CTE,
    STATIONS_CTE,
    load_table,
    register_views,
    rides,
    stations,
)

__all__ = [
    "BASE_TABLES",
    "RIDES_CTE",
    "STATIONS_CTE",
    "load_table",
    "register_views",
    "rides",
    "stations",
]
