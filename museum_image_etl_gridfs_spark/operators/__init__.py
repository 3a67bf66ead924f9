"""Relational and custom operators (DataFrame -> DataFrame)."""
