"""apache_beam_challange_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``Warhorze/apache_beam_challange`` (an Apache Beam / Dataflow
pipeline suite over the London-bicycles dataset), re-expressed Spark-first:
DataFrame/SQL logical plans optimized by Catalyst, executed by Tungsten.

Layout:
    session     SparkSession factory with scale-tuned defaults
    sources     parquet catalog + derived reference-shaped views
    functions   scalar/array expression builders (geo, text, vector)
    operators   DataFrame->DataFrame operators (relational, joins, dedup, ...)
    plans       the named query registry + DuckDB oracle twins
    streaming   Structured Streaming slice over the events table
"""

from apache_beam_challange_spark.session import get_spark

__all__ = ["get_spark"]
