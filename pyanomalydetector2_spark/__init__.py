"""pyanomalydetector2_spark — a brand-new PySpark-native schema + constraint
validation engine with the query/data-processing capabilities of
``toku463ne/pyAnomalyDetector2`` (reference at /root/reference, studied for
WHAT it computes, never copied).

Layout
------
- ``session``      SparkSession factory (AQE, Arrow, adaptive skew join).
- ``sources``      table loaders + a parquet-backed snapshot catalog with an
                   Iceberg-shaped API (snapshots, MERGE-style upsert, time travel).
- ``operators``    the operator inventory from SURVEY.md §2 re-expressed as
                   DataFrame transformations: moment stats, window kernels,
                   the detect1/2/3 screens, uniqueness, referential integrity,
                   distribution drift, dedup, similarity search, text analysis,
                   multimodal (audio/PCM) row invariants.
- ``constraints``  declarative constraint DSL → Column compiler + suite runner
                   emitting pass/fail verdicts and violation rows.
- ``streaming``    incremental-batch watermark/checkpoint machinery (the
                   re-imagining of the reference's *_updates tables).
- ``datagen``      deterministic synthetic clips (audio+transcript) generator.
- ``plans``        plan-inspection helpers (assert pushdown / codegen / no
                   unnecessary shuffles) used by tests.
"""

__version__ = "0.1.0"
