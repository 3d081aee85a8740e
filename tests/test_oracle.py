"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


# DuckDB output types the driver's arrow-based hasher round-trips
# losslessly and identically to Spark. Anything else (HUGEINT from
# SUM(BIGINT) promotion, DECIMAL from round()) hashes differently at the
# driver even when fetchall() values numerically match — reject it here
# so the local gate can't pass what the driver fails (VERDICT r1 §wrong 2).
_DUCK_TYPE_OK = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "FLOAT", "DOUBLE",
    "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "BLOB",
}


def _check_duck_types(name, rel):
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ)
        base = t.split("(")[0].strip()
        if base.endswith("[]"):  # list types: check element
            base = base[:-2].strip()
        assert base in _DUCK_TYPE_OK, (
            f"{name}: oracle column {col} has DuckDB type {t} — the driver "
            f"hash will diverge from Spark; add an explicit CAST in the SQL"
        )


def _norm(v):
    # Ints and floats normalize to DISTINCT tags: the driver hashes typed
    # columns, so int 5 vs double 5.0 is a driver mismatch even though
    # Python's == says they're equal. Never round-trip ints through float
    # (precision loss above 2^53 would hide real diffs).
    if v is None:
        return None
    if isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    import decimal

    if isinstance(v, decimal.Decimal):
        raise AssertionError(
            f"Decimal value {v!r} in result — driver hashing of DECIMAL is "
            f"not engine-identical; CAST to BIGINT/DOUBLE in the query"
        )
    return str(v)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracle_coverage():
    missing = [n for n in QUERIES if n not in ORACLES]
    # only genuinely non-SQL-expressible ops may omit the oracle:
    # HLL approximation is engine-specific; winnowing needs the rolling-
    # hash kernel (its SQL half — the fingerprint self-join — is plain SQL)
    assert set(missing) <= {"approx_distinct_urls",
                            "text_winnowing_neardup",
                            "text_compression_ratio"}, missing


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in df.columns]
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in ORACLES:
        assert len(spark_rows) >= 0  # rows-only check
        return
    rel = duck.sql(ORACLES[name])
    _check_duck_types(name, rel)
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _rows_to_set(spark_cols, spark_rows)
    b = _rows_to_set(duck_cols, duck_rows)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only: {diff_a}\n duck-only: {diff_b}"
        )


def test_minhash_lsh_recall_of_synthesized_neardups(spark):
    """The LSH banding must actually FIND the synthesized near-copies
    (doc_id+1000000 = 80% prefix): recall ≥ 0.9 on mutated pairs, plus
    parity with the oracle is checked separately."""
    df = QUERIES["dedup_minhash_lsh"](spark, SF_DIR)
    pairs = {(r.doc_a, r.doc_b) for r in df.collect()}
    import duckdb as _d

    con = _d.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    expected = {
        (r[0], r[0] + 1000000)
        for r in con.sql(
            "SELECT doc_id FROM documents WHERE doc_id < 300 AND doc_id % 3 = 0"
        ).fetchall()
    }
    con.close()
    found = pairs & expected
    assert len(found) >= 0.9 * len(expected), (
        f"LSH recall {len(found)}/{len(expected)}"
    )


def test_jaccard_scores_mutated_pairs_high(spark):
    df = QUERIES["dedup_ngram_jaccard"](spark, SF_DIR)
    rows = {(r.doc_a, r.doc_b): r.jaccard_bp for r in df.collect()}
    mutated = {k: v for k, v in rows.items() if k[1] >= 1000000}
    assert mutated, "mutated near-dups must surface"
    # 80% prefix of the same text ⇒ high shingle overlap
    assert all(v >= 3000 for v in mutated.values())
