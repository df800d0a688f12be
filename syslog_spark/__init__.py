"""syslog_spark — a PySpark-native syslog parse→enrich→route→aggregate engine.

A from-scratch Spark-first re-expression of the capabilities of the
reference Go parsing library (Arthurgyh/syslog): vectorized RFC 5424 /
Nginx access / Nginx error parsing over Iceberg/Parquet tables of
pre-tokenized byte sequences, broadcast enrichment, partitioned fan-out
routing, and per-sink aggregation — plus the training-data operations a
100 TB pipeline needs (dedup, similarity search, text analysis).
"""

from . import constants
from .session import build_session

__all__ = ["constants", "build_session"]
__version__ = "0.1.0"
