"""Topic sources/sinks: the reference's pub/sub surface on Spark."""
