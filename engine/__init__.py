"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline (parkernisbet/dask-emnist-classification, see
/root/reference/main.py) plus the standard relational surface and
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) required by the driver contract.

Design stance (SURVEY.md §7): everything is a DataFrame; ML is
pyspark.ml Pipeline stages; no RDD API; Python kernels only behind
pandas UDFs; every stochastic op takes an explicit seed; plans are
declared so Catalyst/AQE pick physical strategies that survive a
100 TB / 1000-executor scale-up.
"""

__version__ = "0.1.0"
