"""Catalyst expression helpers shared by the operator library.

Everything here returns ``pyspark.sql.Column`` objects (whole-stage
codegen friendly) — no Python UDFs.
"""
