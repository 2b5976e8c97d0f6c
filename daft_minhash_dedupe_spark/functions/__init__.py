from daft_minhash_dedupe_spark.functions.normalize import normalize_text
from daft_minhash_dedupe_spark.functions.minhash import (
    shingle_hashes,
    minhash_signature,
)
from daft_minhash_dedupe_spark.functions.hashing import doc_id_from_url

__all__ = [
    "normalize_text",
    "shingle_hashes",
    "minhash_signature",
    "doc_id_from_url",
]
