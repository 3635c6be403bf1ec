from sparkall_spark.functions.transforms import apply_transform_chain, transform_column

__all__ = ["apply_transform_chain", "transform_column"]
