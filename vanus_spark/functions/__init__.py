"""Vanus-semantic scalar functions as Spark Column expressions."""
