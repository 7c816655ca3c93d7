"""Sources & sinks — Spark-first equivalents of the reference's
InputFormat/OutputFormat zoo (SURVEY.md §2.1)."""
