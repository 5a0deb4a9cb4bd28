"""Operator families of the idiomatic analytics layer."""
