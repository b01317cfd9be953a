from apache_beam_challange_spark.functions.geo import haversine_km, haversine_km_sql

__all__ = ["haversine_km", "haversine_km_sql"]
