from .arn import stream_name_from_arn  # noqa: F401
from .json_payload import decode_payload, extract_commit_timestamp, parse_cdc_payload, CDC_SCHEMA  # noqa: F401
from .hashing import md5_seeded, shingles, shingles_of_tokens, word_tokens, simhash_bits  # noqa: F401
from .vectors import quantize_embedding, dot_q, cosine  # noqa: F401
