"""Stateful streaming dedup: first-seen-wins over an unbounded stream.

The batch dedup suite (operators/dedup.py) answers "which rows are
duplicates" over a fixed table; a training-data INGEST pipeline needs
the streaming form — new documents arrive forever, and only the first
arrival of each content hash should pass through. That is a custom
stateful operator (per-key "seen" state that outlives any window), so
it runs on applyInPandasWithState: state lives in the streaming
checkpoint, survives restarts, and scales out by the hash key.

Semantics: within a micro-batch the smallest id wins (deterministic
regardless of partition order); across batches the earlier batch wins
(streaming first-seen). Duplicate counts accumulate in state and emit
with every update so a downstream sink can track dup pressure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["streaming_first_seen", "streaming_first_seen_images"]

OUT_SCHEMA = StructType(
    [
        StructField("text_hash", StringType()),
        StructField("canonical_id", LongType()),
        StructField("n_seen", LongType()),
        StructField("is_new", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("canonical_id", LongType()), StructField("n_seen", LongType())]
)


def streaming_first_seen(
    docs: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Streaming exact dedup over a text column.

    Emits one row per (hash, micro-batch-with-arrivals): the canonical
    (first-seen) id, the running duplicate count, and whether this
    batch introduced the hash. Filter `is_new` for the pass-through
    stream; the full feed is the dup-pressure metric stream.
    """
    hashed = docs.select(
        F.md5(F.col(text)).alias("text_hash"), F.col(id_col).alias("_id")
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        batch_min = None
        batch_n = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = int(pdf["_id"].min())
            batch_min = m if batch_min is None else min(batch_min, m)
            batch_n += len(pdf)
        if batch_n == 0:
            return
        if state.exists:
            canonical, n_seen = state.get
            is_new = False
        else:
            canonical, n_seen = batch_min, 0
            is_new = True
        n_seen += batch_n
        state.update((int(canonical), int(n_seen)))
        yield pd.DataFrame(
            {
                "text_hash": [key[0]],
                "canonical_id": [int(canonical)],
                "n_seen": [int(n_seen)],
                "is_new": [is_new],
            }
        )

    return hashed.groupBy("text_hash").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


IMG_OUT_SCHEMA = StructType(
    [
        StructField("phash", LongType()),
        StructField("canonical_id", StringType()),
        StructField("n_seen", LongType()),
        StructField("is_new", BooleanType()),
    ]
)

IMG_STATE_SCHEMA = StructType(
    [StructField("canonical_id", StringType()), StructField("n_seen", LongType())]
)


def streaming_first_seen_images(
    images: DataFrame, id_col: str = "image_id", phash: str = "phash"
) -> DataFrame:
    """Streaming exact-phash image dedup: first arrival of each 64-bit
    perceptual hash wins; later byte-identical (or hash-identical)
    images count as duplicates.

    Same state machine as streaming_first_seen, keyed directly on the
    already-stored phash column — no decode in the stream path, so
    ingest throughput is scan-bound. NEAR-dup streaming is the two
    stage design: this operator collapses exact hashes online; the
    banded hamming pass (phash_components) runs as the periodic batch
    compaction over the survivors, exactly how large ingest pipelines
    split online/offline dedup work.
    """
    keyed = images.select(F.col(phash).alias("phash"), F.col(id_col).alias("_id"))

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        batch_min = None
        batch_n = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = str(pdf["_id"].min())
            batch_min = m if batch_min is None else min(batch_min, m)
            batch_n += len(pdf)
        if batch_n == 0:
            return
        if state.exists:
            canonical, n_seen = state.get
            is_new = False
        else:
            canonical, n_seen = batch_min, 0
            is_new = True
        n_seen += batch_n
        state.update((str(canonical), int(n_seen)))
        yield pd.DataFrame(
            {
                "phash": [int(key[0])],
                "canonical_id": [str(canonical)],
                "n_seen": [int(n_seen)],
                "is_new": [is_new],
            }
        )

    return keyed.groupBy("phash").applyInPandasWithState(
        fn, IMG_OUT_SCHEMA, IMG_STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
