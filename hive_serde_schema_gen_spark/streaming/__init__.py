"""Structured Streaming surface: windowed aggregation with watermarks, and
streaming schema inference (the reference's fold is incremental by nature —
``foreachBatch`` makes it a stream consumer)."""
