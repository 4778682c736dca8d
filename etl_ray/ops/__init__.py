"""General operator library over Parquet tables.

Each operator mirrors a reference operator class (SURVEY.md §2) re-expressed
Ray-Data-first, parameterized on an ``sf_dir`` of Parquet tables. Every
SQL-expressible operator has a DuckDB oracle in ``__ray_entry__.oracle_sql``.
"""
