"""PySpark-native finance analytics engine.

A from-scratch re-expression of the capabilities of the reference
pipeline kushalroy79/thriveFinanceDataPipeline (Airflow + pandas FIFO
rewards reconciliation) as an idiomatic Spark engine: declarative
DataFrame/SQL plans, window-based FIFO matching, distributed data
quality, balance analytics, plus LLM-training-data operators (dedup,
similarity search, text analysis, multimodal column plumbing) designed
for 100 TB scale.
"""

__version__ = "0.1.0"
