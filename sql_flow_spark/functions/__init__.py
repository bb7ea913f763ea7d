"""Column-level function library (JVM-first).

Everything here is built from ``pyspark.sql.functions`` so it stays
inside whole-stage codegen; Python/Arrow paths exist only where Spark
built-ins cannot express the semantics (see multimodal.py).
"""
