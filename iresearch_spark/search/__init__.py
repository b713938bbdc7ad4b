from iresearch_spark.search.filters import (  # noqa: F401
    All,
    And,
    Empty,
    ExistsF,
    Fuzzy,
    NGramSimilarity,
    Not,
    Or,
    Phrase,
    Prefix,
    Proxy,
    SamePosition,
    TermF,
    TermRange,
    TermsF,
    Wildcard,
    rewrite,
)
from iresearch_spark.search.numeric import (  # noqa: F401
    GranularRange,
    granular_ranges,
    numeric_terms,
)
from iresearch_spark.search.scorers import BM25, TFIDF, BoostScore  # noqa: F401
from iresearch_spark.search.executor import SearchEngine  # noqa: F401
from iresearch_spark.search.highlight import (  # noqa: F401
    highlight_matches,
    tokenize_with_offsets,
)
from iresearch_spark.search.nested import nested_match  # noqa: F401
