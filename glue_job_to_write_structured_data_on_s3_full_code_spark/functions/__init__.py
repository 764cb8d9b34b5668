from .text import (
    tokens,
    token_count,
    bpe_ish_tokens,
    normalized_text,
    doc_fingerprint,
    token_sort_key,
    consonant_skeleton,
    md5_hash60,
)

__all__ = [
    "tokens",
    "token_count",
    "bpe_ish_tokens",
    "normalized_text",
    "doc_fingerprint",
    "token_sort_key",
    "consonant_skeleton",
    "md5_hash60",
]
