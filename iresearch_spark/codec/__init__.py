from iresearch_spark.codec.varint import encode_varints, decode_varints  # noqa: F401
from iresearch_spark.codec.postings import (  # noqa: F401
    BLOCK_SIZE,
    encode_postings,
    decode_postings,
    decode_blocks,
    encode_positions,
    decode_positions,
    encode_postings_batch,
    encode_positions_batch,
    decode_postings_many,
    encode_payloads_batch,
    encode_span_payloads_batch,
    decode_payloads,
)
