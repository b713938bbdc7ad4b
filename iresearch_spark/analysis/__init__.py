from iresearch_spark.analysis.analyzers import (  # noqa: F401
    ANALYZERS,
    CODE_TOKEN_PATTERN,
    CODE_TOKEN_PATTERN_CI,
    PAYLOAD_ANALYZERS,
    get_analyzer,
    get_payload_analyzer,
    is_payload_analyzer,
    register_analyzer,
    tokenize_series,
)
