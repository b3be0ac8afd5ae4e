from stock_ops_spark.functions import text, timeutils, vector  # noqa: F401
