from apache_beam_challange_spark.plans.registry import ORACLES, QUERIES, query

__all__ = ["ORACLES", "QUERIES", "query"]
