"""music_streaming_etl_glue_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``KPrince-coder/music-streaming-etl-glue``
(an Airflow + AWS Glue music-streaming ETL), plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Design principles
-----------------
* DataFrame/SQL API only — declare logical plans, let Catalyst/Tungsten pick
  physical strategy (broadcast vs sort-merge joins, partial aggregation,
  whole-stage codegen).
* No AWS / Airflow / boto3 dependency: orchestration is a plain Python
  ``Pipeline``; the key-value serving sink is a pluggable
  ``foreachPartition`` writer instead of a driver-side ``collect()`` loop.
* Built for 100 TB: dims broadcast, facts hash-partitioned on join/agg keys,
  outputs partitioned by date, AQE on, approximate-distinct variants exposed.
"""

from music_streaming_etl_glue_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
