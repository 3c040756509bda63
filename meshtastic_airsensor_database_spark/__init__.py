"""meshtastic_airsensor_database_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of UCSC-Atmos-Lab/Meshtastic-AirSensor-DataBase (an IoT
air-quality telemetry stack: MQTT ingest daemons, Postgres fact tables,
pandas batch ETL/analytics), extended with the LLM-data-pipeline operator
surface (dedup, similarity search, multimodal columns, text analysis)
required for 100 TB-scale training-data work.

Design stance (SURVEY.md §7.0):
- schema-first: every table has an explicit ``StructType`` in ``schemas``.
- batch core, streaming shell: every transformation is a pure
  ``DataFrame -> DataFrame`` function usable in batch tests, the DuckDB
  oracle harness, and inside ``foreachBatch``.
- built-ins first: no row-at-a-time Python UDFs anywhere; Pandas UDFs
  (Arrow) only where built-ins cannot express the semantics.
- declare the logical plan; let Catalyst + AQE pick the physical one.
"""

__version__ = "0.1.0"
