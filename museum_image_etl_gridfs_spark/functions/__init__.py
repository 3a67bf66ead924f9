"""Column-level function library (JVM-side expressions; no Python UDFs)."""
