"""gpse — general-purpose Spark engine.

A from-scratch, PySpark-native distributed URL-frontier + fetch scheduler
with the query and data-processing capabilities of the reference
``pszaflarski/gp_crawler`` (see SURVEY.md; the reference checkout at
/root/reference is empty, so capability parity is anchored to
BASELINE.json's north_star/north_rule capability list, not file:line).

Design: everything is a DataFrame plan (Catalyst optimizes); all Python
execution is vectorized Arrow (pandas_udf / mapInPandas / applyInPandas) —
no per-row Python, no RDDs, no driver-side loops over collect().
"""

__version__ = "0.1.0"
