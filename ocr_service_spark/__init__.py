"""ocr_service_spark — a PySpark-native batch content-extraction engine.

A from-scratch re-expression of the computation performed by the
CogStack/ocr-service reference (a FastAPI-per-request OCR/text-extraction
microservice) as an idiomatic Spark DataFrame job over tables of
Common-Crawl-style web pages:

    pages(url, warc_ts, html:binary, text, lang)
        -> classify -> route -> extract -> finalize
    -> results(url, extracted_text, content_type, pages, ...)

Layout
------
- ``extraction/`` — pure-Python deterministic extraction core (no Spark
  imports); everything here runs inside Arrow-batched pandas UDFs.
- ``operators/``  — DataFrame operators (extraction mapInPandas stage,
  salted page-explode, dedup, text analytics, similarity search).
- ``sources/``    — pages-table readers, payload-decoding ladder,
  deterministic synthetic generator, fixture loader.
- ``functions/``  — Column-level helpers (success rule, content types).
- ``plans/``      — end-to-end jobs: session builder, extraction job,
  checkpoint manifest + resume.
- ``streaming/``  — Structured Streaming variant of the extraction job.

The deterministic (NO_OCR) paths reproduce the reference byte-for-byte;
see docstring citations of the form ``<file>:<line>`` which point into
the reference checkout (read-only) for parity checking.
"""

__version__ = "0.1.0"
