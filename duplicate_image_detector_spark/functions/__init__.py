"""Column-expression builders (JVM-side) and their pure-Python mirrors."""
