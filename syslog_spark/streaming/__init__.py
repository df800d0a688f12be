"""syslog_spark.streaming subpackage."""
