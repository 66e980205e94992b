"""Streaming ingest near-dup filter: incoming images vs the kept corpus.

The batch operator `phash_neardup_against` answers "which of these new
images near-duplicate something we already keep" over a fixed batch;
an ingest pipeline wants the same answer continuously as images
arrive. Structured Streaming covers this with NO custom state: the
banded-hash candidate join is a stream-STATIC equi-join (the kept
corpus is the static side), and the exact Hamming verify is a
stateless filter — so the whole operator is append-mode, scales by
the band key, and restarts from the stream checkpoint like any other
source->join->sink query.

Contrast with `dedup_stream.streaming_first_seen` (exact dedup WITHIN
the stream, which genuinely needs per-key state): near-dup-vs-corpus
needs none, because the corpus side is fixed for the query's lifetime.
Corpus updates are a planned restart (re-read the static side), the
same operational model as any dimension-table refresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.dedup import phash_neardup_against

__all__ = ["streaming_neardup_matches"]


def streaming_neardup_matches(
    stream_images: DataFrame,
    corpus: DataFrame,
    max_hamming: int = 8,
    id_col: str = "image_id",
    phash: str = "phash",
    n_bands: int = 4,
) -> DataFrame:
    """(new_id, corpus_id, hamming) append stream of corpus near-dups.

    `stream_images` is a streaming DataFrame (readStream source with at
    least (id_col, phash)); `corpus` is a static DataFrame of the kept
    images. Every arriving image joins the static corpus through the
    same 64/n_bands-bit band split as the batch operator — identical
    output rows to `phash_neardup_against` over the same input set
    (asserted stream==batch in tests).

    Downstream: sink the matches and anti-join them against the raw
    arrivals in the consumer (static-vs-static per micro-batch window
    or via foreachBatch) to get the pass-through set; emitting matches
    keeps THIS query stateless and append-only.
    """
    return phash_neardup_against(
        stream_images,
        corpus,
        max_hamming=max_hamming,
        id_col=id_col,
        phash=phash,
        n_bands=n_bands,
    )
