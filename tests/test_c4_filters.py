"""C4 line/page filters (operators/c4_filters.py)."""


def _c4(spark, rows):
    from cpp_near_dedupe_spark.operators.c4_filters import c4_clean

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_clean(df).collect()}


def test_line_rules(spark):
    text = (
        "This sentence ends properly.\n"          # kept
        "no terminal punctuation here\n"           # dropped: no terminal
        "Too few.\n"                                # dropped: < 3 words
        "Enable javascript to continue reading.\n"  # dropped: javascript
        'He said "stop right there!"\n'             # kept: quote terminal
        "Final line stays here!"                    # kept
    )
    r = _c4(spark, [(1, text)])[1]
    assert r["n_lines"] == 6
    assert r["n_lines_kept"] == 3
    assert r["clean_text"].splitlines() == [
        "This sentence ends properly.",
        'He said "stop right there!"',
        "Final line stays here!",
    ]


def test_page_gates(spark):
    good = "One good sentence here.\nAnother good sentence here.\nA third one lands here."
    r = _c4(spark, [(1, good)])[1]
    assert r["n_sentences"] == 3 and r["keep_page"] is True

    r = _c4(spark, [(1, good + "\nSee the Lorem IPSUM sample text.")])[1]
    assert r["has_lorem_ipsum"] is True and r["keep_page"] is False

    r = _c4(spark, [(1, good + "\nif (x) { y(); } is code.")])[1]
    assert r["has_brace"] is True and r["keep_page"] is False

    r = _c4(spark, [(1, "Only two sentences total. Nothing more here.")])[1]
    assert r["n_sentences"] == 2 and r["keep_page"] is False


def test_null_and_empty(spark):
    out = _c4(spark, [(1, None), (2, "")])
    for i in (1, 2):
        r = out[i]
        assert r["clean_text"] == ""
        assert r["n_lines_kept"] == 0
        assert r["keep_page"] is False


def test_plan_is_shuffle_free(spark):
    from cpp_near_dedupe_spark.operators.c4_filters import c4_clean

    df = spark.createDataFrame([(1, "A line here.")], "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().toString()
    for node in ("Exchange", "Window", "HashAggregate", "SortAggregate",
                 "BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan, node


def test_matches_duckdb_on_adversarial_text(spark):
    import random

    import duckdb
    import pandas as pd

    from cpp_near_dedupe_spark.operators.c4_filters import c4_clean, c4_clean_sql

    rng = random.Random(23)
    pieces = [
        "Good sentence here.", "no punct", "Tiny.", 'quoted line ends "',
        "JAVASCRIPT required now.", "lorem ipsum inside.", "code { brace }",
        "", "   ", "Multi word proper line!", "Question line stays here?",
        "\ttab lead line.", "ok...", "x.",
    ]
    rows = [(0, None), (1, ""), (2, "{"), (3, "...." * 10)]
    for i in range(4, 150):
        rows.append(
            (i, "\n".join(rng.choice(pieces) for _ in range(rng.randint(0, 12))))
        )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = c4_clean(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = (
        con.execute(c4_clean_sql(source="t") + " ORDER BY doc_id")
        .df()
        .reset_index(drop=True)
    )
    assert sorted(got.columns) == sorted(exp.columns)
    for col in got.columns:
        assert list(got[col]) == list(exp[col]), col
