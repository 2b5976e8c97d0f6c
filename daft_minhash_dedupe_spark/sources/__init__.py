from daft_minhash_dedupe_spark.sources.synthetic import (
    generate_web_pages,
    generate_web_pages_pandas,
)

__all__ = ["generate_web_pages", "generate_web_pages_pandas"]
