"""wal_listener_spark — a PySpark-native CDC / incremental-ingest engine.

Re-creates the capabilities of ihippik/wal-listener (a Go daemon that tails
PostgreSQL logical replication via pgoutput and publishes per-transaction
change events at-least-once) as an idiomatic Spark Structured Streaming
pipeline:

    WAL trace (partitioned event stream)
      -> vectorized decode (Arrow / pandas UDF, no per-row Python)
      -> transaction assembly ordered by (lsn, tx_id, seq)
      -> relation-registry typed casts (pgoutput OID matrix)
      -> table/action allow-list filter
      -> event projection + subject routing
      -> last-write-wins / TOAST-coalesce / truncate apply
      -> exactly-once MERGE into a lake table keyed on (repo, path)
         with LSN-watermark dedup, schema evolution, lineage + metrics.

Reference behavior citations (file:line) point into /root/reference
(ihippik/wal-listener v2.11.0). This is a from-scratch Spark-first build,
not a port: the reference's single-threaded socket loop becomes a
partitioned DataFrame plan; ordering and idempotency that the reference
gets for free from one consumer are re-established with per-key windows
and LSN guards (see SURVEY.md §2.6).
"""

__version__ = "0.1.0"
