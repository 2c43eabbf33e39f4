"""Declared queries, one module per domain; all register into
:mod:`..registry` on import."""
