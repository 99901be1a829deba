"""Single-threaded DuckDB oracle for CDC final-state semantics.

Independent implementation of last-writer-wins replay (the semantics
ClickHouse ReplacingMergeTree gives the reference,
/root/reference/internal/connector/destination.go:337-351): per doc_id
the greatest change_lsn wins; a winning op='D' removes the row.
"""

from __future__ import annotations

import duckdb


def final_state(changelog_glob: str) -> list[tuple]:
    """Final (doc_id, tokens, n_tok, source, change_lsn) rows, sorted."""
    return duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT data.doc_id AS doc_id,
                 data.tokens AS tokens,
                 data.n_tok AS n_tok,
                 data.source AS source,
                 change_lsn, op,
                 row_number() OVER (PARTITION BY data.doc_id
                                    ORDER BY change_lsn DESC) AS rn
          FROM read_parquet('{changelog_glob}')
          WHERE type = 'RECORD'
        )
        SELECT doc_id, tokens, n_tok, source, change_lsn
        FROM ranked WHERE rn = 1 AND op <> 'D'
        ORDER BY doc_id
        """
    ).fetchall()


def spark_state_rows(df) -> list[tuple]:
    """Canonicalize a Spark final-state DataFrame for comparison."""
    rows = df.select("doc_id", "tokens", "n_tok", "source", "change_lsn").collect()
    return sorted(
        (r.doc_id, list(r.tokens) if r.tokens is not None else None, r.n_tok, r.source, r.change_lsn)
        for r in rows
    )


def assert_equal_state(spark_df, changelog_glob: str) -> int:
    expected = [
        (d, list(t) if t is not None else None, n, s, l) for d, t, n, s, l in final_state(changelog_glob)
    ]
    actual = spark_state_rows(spark_df)
    assert len(actual) == len(expected), f"row count {len(actual)} != {len(expected)}"
    for a, e in zip(actual, expected):
        assert a == e, f"mismatch: {a} != {e}"
    return len(actual)
