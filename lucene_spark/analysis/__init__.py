from lucene_spark.analysis.tokenizer import (  # noqa: F401
    tokenize,
    tokenize_with_positions,
    tokenize_series,
    MAX_TOKEN_LENGTH,
)
