"""lakeforge — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Spark SQL / Catalyst) engine with
the query and data-processing capabilities of the reference medallion-lakehouse
pipeline (XHossam1911/Big_Data_Task), rebuilt as composable, deterministic,
tested operators, plus large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing, streaming).

Design principles (see SURVEY.md §7):
- DataFrame-first: every operator takes and returns DataFrames; Catalyst and
  Tungsten pick the physical strategy.
- Deterministic: surrogate keys are content hashes (not
  ``monotonically_increasing_id``), dedup survivors are rank-selected under an
  explicit order, results are reproducible run-to-run and engine-to-engine.
- Scale-aware: no driver-side collects in operators, no global
  single-partition windows on hot paths, broadcast hints for dim-sized sides,
  dynamic partition overwrite for incremental merges.
"""

from lakeforge.session import get_spark

__version__ = "0.1.0"
__all__ = ["get_spark", "__version__"]
