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
        # list/map/struct outputs are unhashable in the driver's pandas
        # canonicalization (r3 red row) — reject outright, no element check
        assert not base.endswith("[]") and base not in (
            "MAP", "STRUCT", "LIST", "ARRAY"
        ), (
            f"{name}: oracle column {col} has complex DuckDB type {t} — the "
            f"driver's pandas sort cannot factorize it; serialize "
            f"(array_to_string) or explode to scalar rows"
        )
        assert base in _DUCK_TYPE_OK, (
            f"{name}: oracle column {col} has DuckDB type {t} — the driver "
            f"hash will diverge from Spark; add an explicit CAST in the SQL"
        )


def _check_spark_types(name, df):
    from pyspark.sql import types as T

    for f in df.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), (
            f"{name}: Spark output column {f.name} is {f.dataType.simpleString()}"
            f" — the driver canonicalizes by pandas multi-column sort, which "
            f"factorizes every column; lists are unhashable there "
            f"(TypeError at the driver, r3's one red row). Serialize with "
            f"concat_ws or explode to scalar rows."
        )


def _driver_canon(cols, rows):
    """Replicate the driver's pandas canonicalization: build a DataFrame
    and multi-column sort by sorted column names. pandas' lexsort
    factorizes each column via its hashtable — exactly where an
    array-valued column dies at the driver (``TypeError: unhashable
    type: 'list'`` before any comparison). Running it here means a
    driver-incompatible output shape fails locally first."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=list(cols))
    if len(cols) > 1:
        pdf = pdf.sort_values(by=sorted(cols), kind="stable")
    else:
        pdf = pdf.sort_values(by=list(cols)[0], key=lambda s: s.map(repr))
    return pdf


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


def test_driver_window_curation():
    """The driver verifies a 50-slot prefix of queries(): the curated
    order must be valid (registered names, no dups, exactly the window
    size), every query with NO driver verdict ever must sit inside the
    prefix, and no query's latest verdict may age past 2 rounds — a
    query absent from the two most recent CORRECTNESS ledgers must be
    back in the window (VERDICT r3 next #2)."""
    import json

    from pdfspark.queries import DRIVER_PRIORITY, driver_ordered_queries

    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    assert all(n in QUERIES for n in DRIVER_PRIORITY)
    ordered = list(driver_ordered_queries())
    assert ordered[:50] == DRIVER_PRIORITY
    assert set(ordered) == set(QUERIES)
    ledgers = []
    for f in sorted(
        f for f in os.listdir(".") if f.startswith("CORRECTNESS_r")
    ):
        ledgers.append(set(json.load(open(f))))
    verified_ever = set().union(*ledgers) if ledgers else set()
    never = [n for n in QUERIES
             if n not in DRIVER_PRIORITY and n not in verified_ever]
    assert not never, f"queries with no driver verdict ever: {never}"
    recent = set().union(*ledgers[-2:]) if ledgers else set()
    stale = [n for n in QUERIES
             if n not in DRIVER_PRIORITY and n not in recent]
    assert not stale, (
        f"queries whose driver verdict would age past 2 rounds: {stale}"
    )


def test_oracle_coverage():
    # every registered query has an oracle since r3: the former rows-only
    # trio gained real twins (winnowing re-derived in closed-form SQL;
    # HLL/zlib checked via exact columns + bound/pinned-spot contracts)
    missing = [n for n in QUERIES if n not in ORACLES]
    assert not missing, missing


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    _check_spark_types(name, df)
    spark_cols = [c.lower() for c in df.columns]
    spark_rows = [tuple(r) for r in df.collect()]
    _driver_canon(spark_cols, spark_rows)
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


def _compare(spark_df, duck, duck_sql, label):
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck.sql(duck_sql)
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), label
    assert len(spark_rows) == len(duck_rows), (
        f"{label}: {len(spark_rows)} vs {len(duck_rows)}"
    )
    assert _rows_to_set(spark_cols, spark_rows) == \
        _rows_to_set(duck_cols, duck_rows), label
    return len(spark_rows)


@pytest.mark.parametrize("suite", [
    "jaccard", "simhash", "simhash_pairs", "components", "minhash"
])
def test_neardup_uncapped_parity(spark, duck, suite):
    """The registered dedup queries slice the corpus (cap=200/300) to
    bound driver cost; parity must ALSO hold with the cap removed — the
    full documents table plus every synthesized mutant (run with
    ORACLE_SF_DIR=/root/testdata/sf0.01 for the second pinned SF)."""
    import pdfspark.queries as q

    cap = q._UNCAPPED
    for t in ("documents",):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet") \
            .createOrReplaceTempView(t)
    if suite == "jaccard":
        df = spark.sql(q._jaccard_sql(q._POSEXPLODE_SPARK, cap))
        sql = q._jaccard_sql(q._POSEXPLODE_DUCK, cap)
    elif suite == "simhash":
        df = spark.sql(q._simhash_spark_sql(cap))
        sql = q._simhash_duck_sql(cap)
    elif suite == "simhash_pairs":
        df = spark.sql(q._simhash_pairs_spark_sql(cap))
        sql = q._simhash_pairs_duck_sql(cap)
    elif suite == "components":
        df = q._dedup_components_impl(spark, SF_DIR, cap)
        sql = q._components_oracle_sql(cap)
    else:
        df = q._dedup_minhash_impl(spark, SF_DIR, cap)
        sql = q._minhash_duck_sql(cap)
    n = _compare(df, duck, sql, f"uncapped-{suite}")
    assert n > 0, f"uncapped {suite} produced no rows — corpus broken?"


def test_hot_shingle_cap_drops_boilerplate_without_killing_signal(spark):
    """A shingle shared by every document (template boilerplate) must NOT
    produce k² candidate pairs — the df cap drops it from the shingle set
    — while genuine near-dups sharing rare shingles still pair."""
    import pdfspark.queries as q

    boiler = "all rights reserved copyright two thousand twenty four inc"
    rows = [(i, f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d")
            for i in range(150)]
    # one genuine near-dup pair sharing plenty of rare shingles
    body = " ".join(f"signal{j}" for j in range(30))
    rows += [(9001, boiler + " " + body), (9002, boiler + " " + body)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    df = spark.sql(q._jaccard_sql(q._POSEXPLODE_SPARK, q._UNCAPPED))
    pairs = {(r.doc_a, r.doc_b) for r in df.collect()}
    assert (9001, 9002) in pairs, "real near-dups must survive the cap"
    # without the cap the boilerplate shingles alone pair all 152 docs
    # (11k+ pairs); with it only the genuine pair (and its mutants) remain
    assert len(pairs) < 50, f"boilerplate exploded into {len(pairs)} pairs"


def test_jaccard_scores_mutated_pairs_high(spark):
    df = QUERIES["dedup_ngram_jaccard"](spark, SF_DIR)
    rows = {(r.doc_a, r.doc_b): r.jaccard_bp for r in df.collect()}
    mutated = {k: v for k, v in rows.items() if k[1] >= 1000000}
    assert mutated, "mutated near-dups must surface"
    # 80% prefix of the same text ⇒ high shingle overlap
    assert all(v >= 3000 for v in mutated.values())


def test_signlsh_parity(spark, duck):
    """Sign-LSH (random-hyperplane) bucketed ANN — implemented r4,
    registers in the r5 window rotation: the all-integer pipeline
    (quantize → md5-parity ±1 planes → sign bits → two 8-bit band keys
    → candidate join → exact integer cosine top-5) must agree between
    engines exactly, return candidates for every query, and keep rnk
    bounded."""
    import pdfspark.queries as q

    for t in ("embeddings",):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet") \
            .createOrReplaceTempView(t)
    df = q._ann_signlsh_impl(spark, SF_DIR)
    n = _compare(df, duck, q._signlsh_duck_sql(), "signlsh")
    assert n > 0
    rows = df.collect()
    qids = {r.qid for r in rows}
    assert qids == {0, 1, 2, 3, 4}  # every query found bucket-mates
    assert all(1 <= r.rnk <= 5 for r in rows)
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)


def test_signlsh_no_cartesian_plan(spark):
    """The candidate join must be banded (hash join on (band, bkey)),
    never an all-pairs product of the base."""
    import pdfspark.queries as q

    df = q._ann_signlsh_impl(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan


def test_audio_meta_parity(spark, duck):
    """Audio modality (r5 registration queue): the fused synth→parse
    WAV roundtrip must agree with the closed-form oracle — every
    header field the REAL RIFF walker reads back equals the
    generator's doc_id formulas."""
    import pdfspark.queries as q

    for t in ("documents",):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet") \
            .createOrReplaceTempView(t)
    df = q._audio_meta_impl(spark, SF_DIR)
    n = _compare(df, duck,
                 q._AUDIO_META_ORACLE.format(strtype="VARCHAR"),
                 "audio_meta")
    assert n > 0
    assert all(r.error is None for r in df.collect())


def test_video_meta_parity(spark, duck):
    """Video modality (registered r5): fused synth→parse MP4 roundtrip
    == closed-form oracle."""
    import pdfspark.queries as q

    for t in ("documents",):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet") \
            .createOrReplaceTempView(t)
    df = q._video_meta_impl(spark, SF_DIR)
    n = _compare(df, duck,
                 q._VIDEO_META_ORACLE.format(strtype="VARCHAR"),
                 "video_meta")
    assert n > 0
    assert all(r.error is None for r in df.collect())


def test_image_meta_parity(spark, duck):
    """Image modality (registered r5, VERDICT r4 next #2): the fused
    synth→parse roundtrip over REAL PNG/JPEG/BMP header parsing must
    agree with the closed-form oracle — format, dims, depth and
    channel count all recomputed from doc_id, zero error rows."""
    import pdfspark.queries as q

    for t in ("documents",):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet") \
            .createOrReplaceTempView(t)
    df = q._image_meta_impl(spark, SF_DIR)
    n = _compare(df, duck,
                 q._IMAGE_META_ORACLE.format(strtype="VARCHAR"),
                 "image_meta")
    assert n > 0
    rows = df.collect()
    assert all(r.error is None for r in rows)
    assert {r.fmt for r in rows} == {"png", "jpeg", "bmp"}


def test_span_excise_empty_bench_set_engine_parity(spark, duck, tmp_path):
    """Review r5 #3, re-pinned for the r9 mapInPandas shape: with ZERO
    qualifying benchmark docs the excerpt broadcast is an empty list
    and the fold must be the identity (n_excised=0, clean_md5 = md5 of
    the unmodified text) — while the DuckDB oracle's COALESCE keeps
    its NULL array_agg at the identity fold too, instead of NULLing
    every row. Drives the REAL registered query end-to-end from a
    parquet corpus where no doc satisfies doc_id % 37 = 0 AND
    len >= 125."""
    from pdfspark.queries import ORACLES, QUERIES

    corpus_dir = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(f"{corpus_dir}/documents.parquet")
    # try/finally: the swapped duck view is shared (module-scoped duck
    # fixture) — a failure here must not cascade into later tests
    # (review r5.2 #2); the Spark side reads its own sf_dir, so only
    # the temp view registered by _load needs restoring
    try:
        duck.execute(
            "CREATE OR REPLACE VIEW documents AS SELECT * FROM ("
            "VALUES (1, 'alpha beta gamma'),"
            " (2, 'delta epsilon zeta')) t(doc_id, text)")
        df = QUERIES["decontaminate_span_excise"](spark, corpus_dir)
        n = _compare(df, duck, ORACLES["decontaminate_span_excise"],
                     "span_excise_empty")
        assert n == 2
        rows = df.collect()
        assert all(r.n_excised == 0 for r in rows)
    finally:
        spark.read.parquet(f"{SF_DIR}/documents.parquet") \
            .createOrReplaceTempView("documents")
        duck.execute(
            "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )


def test_table_sparse_parity(spark, duck):
    """Sparse-table extraction (r6 registration queue): with every 5th
    cell omitted at generation, the grid reconstruction must emit
    exactly the surviving (row, col, cell) set — row and column ranks
    aligned with the dense arithmetic even around the holes. (The
    harness reads parquet directly — no temp view needed; one fused
    execution, hole count checked against the oracle-side dense
    count.)"""
    import pdfspark.queries as q

    df = q._table_sparse_impl(spark, SF_DIR)
    n = _compare(df, duck, q._TABLE_SPARSE_SQL, "table_sparse")
    assert n > 0
    # holes really exist: fewer cells than the DENSE oracle's count
    # (computed in DuckDB — no second fused Spark execution)
    dense = duck.sql(
        f"SELECT COUNT(*) FROM ({q._TABLE_CELLS_SQL})"
    ).fetchone()[0]
    assert n < dense


def test_html_table_cells_parity(spark, duck):
    """HTML-table structured extraction (r6 registration queue): the
    <table> modality must emit the identical (row, col, cell) set as
    the PDF grid — both generators share the word-pair arithmetic, so
    the dense-table SQL is the oracle for both."""
    import pdfspark.queries as q

    df = q._html_table_cells_impl(spark, SF_DIR)
    n = _compare(df, duck, q._TABLE_CELLS_SQL, "html_table_cells")
    assert n > 0


def test_r6_pairs_on_edge_corpus(spark, tmp_path):
    """Cross-validate the r6 generator/oracle pairs on word counts the
    testdata never produces (docs are 10-99 words there): 1-40 word
    documents hit the sub-n-gram, single-heading-group, partial-row and
    trailing-span edges of every closed-form oracle, plus two docs
    sharing a 20-gram so the substring dedup stays non-vacuous. Exact
    match of sorted stringified values, same as the driver compare."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    base = src.to_pandas()
    vocab = "alpha beta gamma delta eps zeta eta theta".split()
    rows = []
    for i in range(40):
        text = " ".join(vocab[j % len(vocab)] for j in range(i + 1))
        rows.append(dict(base.iloc[i % len(base)]))
        rows[-1].update(doc_id=i, text=text, n_chars=len(text))
    shared = " ".join(vocab[j % len(vocab)] for j in range(25))
    for k, extra in enumerate(["pre " + shared, shared + " post"]):
        rows.append(dict(base.iloc[k]))
        rows[-1].update(doc_id=100 + k, text=extra, n_chars=len(extra))
    edge_dir = str(tmp_path / "edge_sf")
    os.makedirs(edge_dir)
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), schema=src.schema,
                             preserve_index=False),
        f"{edge_dir}/documents.parquet")

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{edge_dir}/documents.parquet')")
    try:
        for name in ("pdf_table_ragged", "pdf_table_header_flag",
                     "html_table_spans", "html_heading_outline",
                     "html_section_chunks", "dedup_substring_spans",
                     "pdf_rtl_reading_order", "pdf_table_sparse"):
            sdf = QUERIES[name](spark, edge_dir).toPandas()
            ddf = con.execute(ORACLES[name]).df()
            cols = sorted(sdf.columns)
            a = sdf[cols].sort_values(cols).reset_index(drop=True)
            b = ddf[cols].sort_values(cols).reset_index(drop=True)
            assert a.shape == b.shape, (name, a.shape, b.shape)
            for c in cols:
                assert (a[c].astype(str).values
                        == b[c].astype(str).values).all(), (name, c)
    finally:
        con.close()


def test_ann_index_takedown_semantics(spark):
    """Beyond parity: the takedown subtraction must BIND. The queries
    are the taken-down vectors themselves, so without the tombstone
    subtraction every query's rank-1 would be its own index row (the
    self dot is that query's maximum over its own cell by
    construction — it's in the cell it is nearest to). The registered
    output must therefore never self-match, never surface ANY
    taken-down id (retrieving removed content is the violation the
    query exists to catch), and still find live neighbors for every
    taken-down vector at this SF (no vacuously-empty cells)."""
    df = QUERIES["ann_index_takedown"](spark, SF_DIR)
    rows = df.collect()
    assert rows
    assert all(r.neighbor_id % 7 != 0 for r in rows)
    assert all(r.neighbor_id != r.query_id for r in rows)
    n_queries = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .where("vec_id % 7 = 0").count()
    assert len({r.query_id for r in rows}) == n_queries
    assert all(1 <= r.rnk <= 2 for r in rows)


def test_digest_takedown_both_outcomes(spark):
    """Beyond parity: both takedown outcomes must actually occur in
    the output — copies of TAKEN-DOWN content kept (first copy) and
    dropped against the batch keeper (second copy), copies of live
    history dropped against the historic keeper."""
    rows = {r.doc_id: (r.keep, r.dup_of) for r in
            QUERIES["dedup_digest_takedown"](spark, SF_DIR).collect()}
    kept_recrawls = [d for d, (k, _) in rows.items()
                     if k == 1 and d < 2000000]
    hist_drops = [d for d, (k, o) in rows.items()
                  if k == 0 and o is not None and o < 1000000]
    batch_drops = [d for d, (k, o) in rows.items()
                   if k == 0 and o is not None and 1000000 <= o < 2000000]
    assert kept_recrawls and hist_drops and batch_drops
    # every kept recrawl's origin keeper was on the takedown list
    assert all((d - 1000000) % 6 == 0 for d in kept_recrawls)
