"""Command-line entry points — the reference's runnable scripts, ported
to the engine (SURVEY.md §3: a reference user invokes programs, not a
library):

  cleandata  — cleandata.py CLI (PurpleAir CSV normalize -> clean CSV)
  graphdata  — graphdata.py CLI (cross-sensor alignment -> per-metric CSV)
  ingest     — the AIRWISE daemon dual (landing-dir stream -> fact tables)
  querygen   — QuerryGenerator.py CLI (text lines -> JSON documents)

Run as ``python -m meshtastic_airsensor_database_spark.cli.<name> ...``.
Each module exposes ``main(argv)`` so tests drive them in-process.
"""
