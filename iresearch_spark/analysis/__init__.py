from iresearch_spark.analysis.analyzers import (  # noqa: F401
    ANALYZERS,
    CODE_TOKEN_PATTERN,
    get_analyzer,
    register_analyzer,
    tokenize_series,
)
