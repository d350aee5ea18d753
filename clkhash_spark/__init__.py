"""spark-clk-linkage: a PySpark-native CLK record-linkage engine.

From-scratch reimplementation of the capabilities of data61/clkhash on
Spark DataFrames + Arrow-vectorized pandas UDFs: schema-driven CLK
encoding (byte-identical to the reference per record), LSH-banded
blocking with skew control, batched Dice-coefficient pair scoring, and
iterative connected-components clustering — plus the large-scale
training-data operators (dedup, similarity search, text analysis) a
web-scale pipeline needs.
"""

__version__ = "0.1.0"
