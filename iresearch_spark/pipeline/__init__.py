from iresearch_spark.pipeline.text import (  # noqa: F401
    token_stats,
    fingerprints,
    quality_scores,
    language_id,
)
from iresearch_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_lsh_pairs,
    simhash_signatures,
)
from iresearch_spark.pipeline.similarity import (  # noqa: F401
    cosine_pairs,
    cosine_topk,
    lsh_ann_topk,
)
