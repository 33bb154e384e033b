"""Streaming surface.

The reference is strictly batch (SURVEY.md §2.10): no watermarks, windows,
or stateful operators exist in it, and the north rule specifies restartable
batch (per-stage checkpoints) rather than Structured Streaming.  What this
package provides is the *incremental ingest* analog: new pages appended to a
landing directory are signed with exactly the batch signature expressions
via Structured Streaming, so downstream re-clustering only recomputes the
LSH/verify stages over the delta.
"""
