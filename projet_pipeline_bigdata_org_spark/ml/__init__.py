"""SparkML pipeline."""
