from daft_minhash_dedupe_spark.streaming.dedupe_stream import (
    streaming_exact_dedupe,
    streaming_lang_counts,
)
from daft_minhash_dedupe_spark.streaming.sessionize import streaming_sessionize

__all__ = ["streaming_exact_dedupe", "streaming_lang_counts", "streaming_sessionize"]
