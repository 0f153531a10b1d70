"""Named query plans: the oracle-checked corpus (SURVEY.md §2 coverage)."""

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES
from martech_pipelines_spark.plans import corpus_extended  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_more  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_tpch2  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_scale  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r4  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_tpch3  # noqa: F401  (registers)

__all__ = ["QUERIES", "ORACLE"]
