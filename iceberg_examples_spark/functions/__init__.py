from iceberg_examples_spark.functions.exact import money_sum, money_avg  # noqa: F401
