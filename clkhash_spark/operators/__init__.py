"""Spark DataFrame operators: CLK encode, LSH blocking, Dice scoring,
connected-components clustering, evaluation, stats, and the
training-data-pipeline extras (dedup, similarity, text analysis)."""
