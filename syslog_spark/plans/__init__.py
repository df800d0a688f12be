"""syslog_spark.plans subpackage."""
