from prefix_filter_spark.plans.sharding import hashed_key_col, shard_col  # noqa: F401
