"""syslog_spark.operators subpackage."""
