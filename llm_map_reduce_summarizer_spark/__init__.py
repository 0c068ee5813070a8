"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference LLM map-reduce summarizer, re-expressed
Spark-first (DataFrame/SQL, Catalyst-optimized), plus the dedup /
similarity / text-analysis / multimodal operators a large-scale
training-data pipeline needs.
"""

__version__ = "0.1.0"
