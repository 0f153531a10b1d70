"""Named query plans: the oracle-checked corpus (SURVEY.md §2 coverage)."""

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
