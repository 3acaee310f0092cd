"""xsarsea_spark — PySpark-native analytics engine with the query and
data-processing capabilities of umr-lops/xsarsea, plus large-scale
training-data pipeline operators (dedup, similarity search, text
analysis, multimodal columns).
"""

__version__ = "0.1.0"
