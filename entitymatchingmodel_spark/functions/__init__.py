"""Scalar/string/vector function library (Column -> Column, JVM-side first)."""
