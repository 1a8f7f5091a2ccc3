"""stock_streaming_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``NgQuangHuyit/stock-streaming-data-pipeline`` (surveyed in
``SURVEY.md``), re-expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for the streaming surface, Pandas UDFs only
where built-ins genuinely cannot express the semantics.

Layout
------
- ``session``    SparkSession factory with scale-aware defaults
- ``tables``     canonical testdata loaders / view registration
- ``operators``  reusable DataFrame operators (OHLC bars, running state,
                 as-of join, gap fill, dedup, similarity, text analysis, ...)
- ``functions``  scalar helpers shared across operators
- ``plans``      the named query catalog exported through __spark_entry__
- ``sources``    batch/streaming readers and synthetic trade generation
- ``streaming``  Structured Streaming jobs, sinks, and stateful operators
"""

__version__ = "0.1.0"
