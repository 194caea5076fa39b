"""sparkwrangle — a PySpark-native analytics engine.

Rebuilds the query and data-processing capabilities of the reference
(oliverweissl/DataWrangling-Project, a pandas/numpy quantitative
data-wrangling project) as idiomatic Spark: long-format DataFrames,
Catalyst-visible expressions and window functions for everything
relational, and exactly two Arrow-vectorized ``applyInPandas`` stateful
operators for the sequential trade state machines — plus LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns).

Blueprint: SURVEY.md. Golden numbers: BASELINE.md.
"""

from sparkwrangle.session import get_spark, prep_session

__all__ = ["get_spark", "prep_session"]
__version__ = "0.1.0"
