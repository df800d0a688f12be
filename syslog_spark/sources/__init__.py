"""syslog_spark.sources subpackage."""
