"""Reusable column-expression builders (all JVM-side, codegen-eligible)."""
