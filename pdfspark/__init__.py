"""pdfspark — a PySpark-native PDF text-extraction engine.

Built from scratch against the behavior of the reference Rust parser
(connorskees/pdf, surveyed in SURVEY.md). The per-document extraction
kernel (``pdfspark.kernel``) is pure Python/NumPy and runs inside a
vectorized Arrow ``mapInPandas`` stage; everything relational around it
(scans, salting, metrics, resume) is plain ``pyspark.sql`` DataFrame API
so Catalyst/AQE do the optimization.
"""

__version__ = "0.1.0"

from pdfspark.kernel.extract import extract_text  # noqa: F401
