"""Operator library: DataFrame in / DataFrame out for every capability."""
