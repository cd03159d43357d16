

def test_scrub_pii_golden(spark):
    """Redaction + per-pattern counts on hand-built rows, including
    the documented edge semantics: counts measure the SEQUENTIAL
    INTERMEDIATES (emails on raw, ipv4 on the email-redacted text,
    phones on the email+ipv4-redacted text), so each count equals the
    replacements actually performed; redaction is sequential
    email -> ipv4 -> phone so each span rewrites exactly once."""
    from gcp_food_delivery_data_pipeline_spark.operators.text import (
        scrub_pii,
    )

    rows = [
        (1, "mail jo.doe+x@sub.example.co call 555-123-4567 ip 10.0.3.7"),
        (2, "no pii here"),
        (3, "a@b.io c@d.org then 192.168.1.1 and 192.168.001.255"),
        # a dotted quad INSIDE an email host: shielded by <EMAIL>, so
        # it must NOT count in n_ipv4 (pre-r10 raw counting said 1)
        (4, "u@10.0.0.1.com plus a bare 8.8.8.8"),
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
    assert got[3][:2] == (2, 2)
    assert got[3][3] == "<EMAIL> <EMAIL> then <IP> and <IP>"
    assert got[4] == (1, 1, 0, "<EMAIL> plus a bare <IP>")


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


def test_scrub_pii_single_pass_is_fixed_point(spark):
    """For the shipped angle-bracket tokens one pass IS a fixed
    point (no pattern's class contains '<' or '>'), so (a) scrubbing
    the scrubbed text changes nothing — including on the adversarial
    adjacency case, whose '<EMAIL>@d.ee' residue does NOT re-match —
    and (b) ``until_stable=True`` returns byte-identical output and
    identical round-one counts."""
    import re

    from gcp_food_delivery_data_pipeline_spark.operators.text import (
        PII_EMAIL,
        scrub_pii,
    )

    rows = [
        (1, "a@b.coc@d.ee"),                     # overlap-consumed tail
        (2, "plain text"),
        (3, "x@y.a@b.cc then 9.9.9.9.123-456-7890"),
        (4, "u@10.0.0.1.com 555-123-4567 10.1.2.3"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    single = {r.doc_id: r for r in scrub_pii(df).collect()}
    stable = {
        r.doc_id: r for r in scrub_pii(df, until_stable=True).collect()
    }
    assert single[1].text_scrubbed == "<EMAIL>@d.ee"
    assert not re.search(PII_EMAIL, single[1].text_scrubbed)
    # re-scrub of the scrubbed column is the identity
    rescrub = {
        r.doc_id: r.text_scrubbed
        for r in scrub_pii(
            df.sparkSession.createDataFrame(
                [(d, single[d].text_scrubbed) for d in single],
                "doc_id int, text string",
            )
        ).collect()
    }
    for d in single:
        assert rescrub[d] == single[d].text_scrubbed
        assert stable[d].text_scrubbed == single[d].text_scrubbed
        assert (
            single[d].n_emails, single[d].n_ipv4, single[d].n_phones
        ) == (stable[d].n_emails, stable[d].n_ipv4, stable[d].n_phones)


def test_scrub_pii_until_stable_stays_zero_shuffle(spark):
    """The statically-unrolled fixpoint is still one codegen
    projection — no exchange, no Python."""
    from gcp_food_delivery_data_pipeline_spark.operators.text import (
        scrub_pii,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    p = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        scrub_pii(df, until_stable=True)._jdf.queryExecution(),
        "formatted",
    )
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


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


def test_word_bigrams_alias(spark):
    """word_bigrams is the n=2 convenience over word_ngrams_all."""
    from gcp_food_delivery_data_pipeline_spark.operators.text import (
        word_bigrams,
        word_ngrams_all,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, "")], "doc_id int, text string"
    )
    got = {
        r.doc_id: r.bg
        for r in df.select("doc_id", word_bigrams("text").alias("bg")).collect()
    }
    assert got == {1: ["a b", "b c"], 2: [], 3: []}
    twin = {
        r.doc_id: r.bg
        for r in df.select(
            "doc_id", word_ngrams_all("text", 2).alias("bg")
        ).collect()
    }
    assert twin == got
