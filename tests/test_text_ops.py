

def test_scrub_pii_golden(spark):
    """Redaction + per-pattern counts on hand-built rows, including
    the documented edge semantics: counts measure the RAW text per
    pattern (a span may count in several), redaction is sequential
    email -> ipv4 -> phone so each span rewrites exactly once."""
    from gcp_food_delivery_data_pipeline_spark.operators.text import (
        scrub_pii,
    )

    rows = [
        (1, "mail jo.doe+x@sub.example.co call 555-123-4567 ip 10.0.3.7"),
        (2, "no pii here"),
        (3, "a@b.io c@d.org then 192.168.1.1 and 192.168.001.255"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_emails, r.n_ipv4, r.n_phones, r.text_scrubbed)
        for r in scrub_pii(df).collect()
    }
    assert got[1] == (
        1, 1, 1, "mail <EMAIL> call <PHONE> ip <IP>",
    )
    assert got[2] == (0, 0, 0, "no pii here")
    # both IPs redact as IPs; the dotted-quad substring ALSO counts
    # as phone-shaped on the raw text (documented multi-count)
    assert got[3][:2] == (2, 2)
    assert got[3][3] == "a@b.io <EMAIL> then <IP> and <IP>".replace(
        "a@b.io", "<EMAIL>", 1
    ) or got[3][3] == "<EMAIL> <EMAIL> then <IP> and <IP>"


def test_scrub_pii_plan_is_zero_shuffle_projection(spark):
    """The scrub is a single whole-stage-codegen projection: no
    exchange, no Python, nothing but the scan and the project."""
    from gcp_food_delivery_data_pipeline_spark.operators.text import (
        scrub_pii,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    p = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        scrub_pii(df)._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "[codegen id :" in p  # formatted plans mark codegen spans


def test_scrub_pii_empty(spark):
    from gcp_food_delivery_data_pipeline_spark.operators.text import (
        scrub_pii,
    )

    df = spark.createDataFrame([], "doc_id int, text string")
    assert scrub_pii(df).count() == 0


def test_gopher_rules_golden(spark):
    """Each Gopher rule fires on the document built to trip it; the
    keep flag is the conjunction; empty docs fail word count with
    NULL ratios (no division by zero)."""
    from gcp_food_delivery_data_pipeline_spark.operators.text import (
        gopher_rules,
    )

    rows = [
        (1, " ".join(["the quick brown fox of and that have with"] * 8)),
        (2, "short doc"),
        (3, " ".join(["####"] * 60)),
        (4, "\n".join(["- b the of and that have with more words"] * 60)),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: r
        for r in gopher_rules(df).collect()
    }
    assert got[1].gopher_keep is True and got[1].n_words == 72
    assert got[2].r_word_count is False and got[2].gopher_keep is False
    # all-symbol doc: symbol ratio 4.0, zero alpha words, no stopwords
    assert got[3].symbol_ratio == 4.0
    assert got[3].r_symbol_ratio is False
    assert got[3].r_alpha_words is False and got[3].r_stopwords is False
    # every line is a bullet -> ratio 1.0 > 0.9
    assert got[4].bullet_line_ratio == 1.0
    assert got[4].r_bullet_lines is False
    assert got[5].n_words == 0 and got[5].mean_word_len is None
    assert got[5].gopher_keep is False


def test_gopher_rules_plan_is_zero_shuffle(spark):
    from gcp_food_delivery_data_pipeline_spark.operators.text import (
        gopher_rules,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    p = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        gopher_rules(df)._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_gopher_rules_empty(spark):
    from gcp_food_delivery_data_pipeline_spark.operators.text import (
        gopher_rules,
    )

    df = spark.createDataFrame([], "doc_id int, text string")
    assert gopher_rules(df).count() == 0
