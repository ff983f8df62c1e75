"""Pure-Python deterministic extraction core (no Spark imports).

Every function in this package is pandas/Arrow-UDF-friendly: bytes in,
str/dict out, no global state, no I/O. The Spark operators in
``ocr_service_spark.operators`` wrap these in ``mapInPandas`` stages.
"""

from ocr_service_spark.extraction.pipeline import extract_document  # noqa: F401
