"""Scalar/text/vector function library (built-in-expression compositions)."""
