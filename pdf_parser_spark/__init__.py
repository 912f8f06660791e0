"""pdf_parser_spark — a PySpark-native main-content extraction engine.

Re-expresses the capabilities of the reference single-node document
parser (``ralphribeiro/pdf_parser``, surveyed in ``SURVEY.md``) as
vectorized pandas/Arrow UDF stages over Spark DataFrames of multi-turn
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Layout
------
- ``kernels/``   pure-Python/numpy reference kernels (exactness lives here)
- ``payload.py`` deterministic transcript synthesizer + payload format
- ``pipeline.py``the Spark extraction pipeline (salting, ordering, metrics)
- ``operators/`` training-data ops: dedup, similarity search, text stats
- ``sources/``   readers/writers + lineage (checkpoint/resume)
- ``functions/`` reusable Spark column expressions
- ``streaming/`` Structured Streaming analogues of the job queue
"""

__version__ = "0.1.0"
