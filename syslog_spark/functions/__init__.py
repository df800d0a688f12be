"""syslog_spark.functions subpackage."""
