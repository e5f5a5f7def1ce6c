from ebike_spark.functions.textfns import (
    cosine_sim,
    md5_long,
    shingles,
    tokens,
)

__all__ = ["md5_long", "tokens", "shingles", "cosine_sim"]
