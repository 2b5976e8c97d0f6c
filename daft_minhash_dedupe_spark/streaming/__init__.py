from daft_minhash_dedupe_spark.streaming.dedupe_stream import (
    streaming_exact_dedupe,
    streaming_lang_counts,
)

__all__ = ["streaming_exact_dedupe", "streaming_lang_counts"]
