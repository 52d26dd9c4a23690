"""Python UDTFs (SURVEY.md §2.10's reserved EXT surface — Spark 4 `udtf`).

``ChunkText``: the training-data chunker — one document row in, one row per
overlapping character window out (size 200, stride 150). Deterministic
arithmetic, so the UDTF path itself is oracle-checkable. Chunking is also
expressible as explode+substr column expressions (the faster JVM path);
the UDTF exists because real chunkers immediately outgrow expressions
(tokenizer-aware boundaries, sentence splitting) and this is the API seam
they plug into.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_SIZE = 200
CHUNK_STRIDE = 150


@udtf(returnType="doc_id bigint, chunk_id bigint, chunk string")
class ChunkText:
    """(doc_id, text) → (doc_id, chunk_id, chunk) rows."""

    def eval(self, doc_id: int, text: str):  # noqa: D102 - UDTF contract
        if text is None:
            return
        n = len(text)
        start, i = 0, 0
        while start < n or (n == 0 and i == 0):
            yield doc_id, i, text[start : start + CHUNK_SIZE]
            start += CHUNK_STRIDE
            i += 1
            if n == 0:
                break
