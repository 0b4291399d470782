"""Scalar / column-expression function library (JVM-side where possible)."""
