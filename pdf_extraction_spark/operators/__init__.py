"""Relational / dedup / similarity / text-analysis operators.

Every public operator comes as a pair: a Spark DataFrame builder
``q_<name>(spark, sf_dir)`` and a DuckDB-compatible ANSI-SQL oracle string
``SQL_<NAME>`` computing the same result on the same parquet tables. The
driver (and tests/test_oracles.py) run both sides and compare row counts,
schemas, and order-insensitive value hashes.

Engine-portability rules used throughout (Spark ⇄ DuckDB):

* hashing only via ``md5`` (identical lowercase hex in both engines) —
  never ``hash``/``xxhash64`` which are engine-specific;
* arrays are 1-indexed in both (``element_at`` ⇄ ``list[i]``);
* ``sequence(a,b)`` ⇄ ``generate_series(a,b)`` (both inclusive);
* floats rounded before output; sums kept in deterministic order;
* timestamps compared via epoch seconds, never emitted raw.
"""
