"""Incremental / streaming validation drivers."""
