"""Scalar/text/vector function library.

Everything here stays JVM-side (pyspark.sql.functions / SQL lambda
expressions) unless explicitly marked as a Pandas UDF — row-at-a-time
Python UDFs are banned from hot paths.
"""
