"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) — the operations a 100TB corpus-preparation pipeline
needs beyond the extraction core.

Design rules shared by every operator here:
  * pure ``pyspark.sql.functions`` in the hot path (JVM, codegen-friendly);
  * deterministic, engine-portable math (integer hashing via md5 prefixes,
    explicit double casts, rounded ranking keys) so each operator has an
    exact DuckDB oracle twin in ``__spark_entry__.oracle_sql``;
  * shuffle keys chosen for scale: signatures/bands instead of all-pairs,
    broadcast for small sides, per-group top-k via windows.
"""
