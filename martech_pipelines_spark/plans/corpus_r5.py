"""Round-5 corpus additions.

New queries register into the shared QUERIES/ORACLE dicts at import time,
exactly like corpus_r4.  Names added here should also be prepended to
plans/__init__._WINDOW_PRIORITY so the driver's 50-slot correctness window
verifies them.
"""

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES  # noqa: F401
