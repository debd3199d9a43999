"""Scalar/column function helpers: exact numeric aggregation, serving-key
synthesis, text expressions."""
