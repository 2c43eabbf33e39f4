"""Relational + data-pipeline operators built on DataFrame primitives."""
