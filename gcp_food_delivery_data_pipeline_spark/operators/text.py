"""Text-analysis operators for training-data pipelines.

These go beyond the reference (which has only the P1-P4 string cleans,
SURVEY.md §2.6) and cover what an LLM-data pipeline runs over a
``documents(doc_id, text, lang, source, n_chars)`` table at 100 TB:

* token counting        — whitespace tokenization, JVM-side
* quality scoring       — length / punctuation / stopword / uppercase
                          ratio features + a composite score
* language ID           — stopword-hit n-gram heuristic (no model deps)
* document fingerprint  — md5 content hash (exact-dup key) + a
                          locality-insensitive normalized fingerprint

Everything is a Column expression (no UDFs): at scale these run inside
WholeStageCodegen directly over the parquet scan, and Catalyst prunes
the scan to the ``text`` column alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.checkpointing import (
    materialize as _ckpt,
)

# Tiny embedded stopword lists — heuristic language ID without models.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "es": ["el", "la", "de", "y", "los", "las", "un", "una", "del", "es"],
    "de": ["der", "die", "das", "und", "den", "von", "zu", "mit", "ist", "ein"],
}

TOKEN_SPLIT_RE = r"\s+"
PUNCT_RE = r"[^\w\s]"

# GPT-2-style pretokenizer shape (contractions | letter runs | digit
# runs | punct runs | whitespace runs), restricted to ASCII classes so
# Java regex (Spark), RE2 (DuckDB) and Python `re` all agree — the
# \p{L}/unicode-class behaviors are where those engines diverge.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9']+|\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a trimmed string (empty string → []).

    ``split`` on an empty string yields ``['']``; the filter removes
    that phantom token so empty/blank docs have NO tokens — otherwise
    every consumer needs its own special case (and tf-idf's
    count/token_count division hits DIVIDE_BY_ZERO under ANSI mode,
    since token_count would be 0 while explode still emits a term).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Number of whitespace-delimited tokens; 0 for empty/blank text."""
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pretokenizer
    regex (contraction suffixes, letter runs, digit runs, punctuation
    runs, whitespace runs). A cheap JVM-side proxy for "how many BPE
    tokens will this doc cost" — real tokenizers sub-split long runs,
    so this is a lower bound, but it ranks/filters documents the same
    way at corpus scale without any Python in the hot path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), F.lit(0)))


ROLLING_BASE = 1000003  # prime base of the polynomial rolling hash
ROLLING_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1


def rolling_fingerprint(col: Column | str) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream:
    ``h = (h*B + hash(token)) mod M`` with the engine-stable md5-based
    token hash.

    Unlike ``fp_md5`` (opaque content hash) the rolling form is
    incrementally maintainable — a stream can extend a document's
    fingerprint without re-reading its prefix — and it is defined
    purely over tokens, so it is whitespace-reflow-invariant like
    ``fp_norm``. Pure ``aggregate`` expression: no UDF, no shuffle.
    Bounds: acc < 2^31, B ≈ 2^20, token hash < 2^32 → the fold's
    intermediate stays far under 2^63.
    """
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast(
        "long"
    )
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(ROLLING_BASE) + tok_hash(t))
        % F.lit(ROLLING_MOD),
    )


def punct_ratio(col: Column | str) -> Column:
    """Punctuation characters / total characters (0 for empty)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(c, r"[\w\s]", "")).cast("double") / n
    )


def stopword_hits(col: Column | str, lang: str = "en") -> Column:
    """Count of tokens that are stopwords of ``lang`` (duplicates count)."""
    c = F.col(col) if isinstance(col, str) else col
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(
        F.filter(tokens(F.lower(c)), lambda t: F.array_contains(sw, t))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-signal columns used for corpus filtering."""
    c = F.col(text_col)
    ntok = token_count(c)
    return (
        df.withColumn("n_chars_q", F.length(c).cast("bigint"))
        .withColumn("n_tokens", ntok.cast("bigint"))
        .withColumn(
            "mean_token_len",
            F.when(ntok > 0, (F.length(F.regexp_replace(c, r"\s+", "")).cast("double") / ntok)).otherwise(F.lit(0.0)),
        )
        .withColumn("punct_ratio", punct_ratio(c))
        .withColumn(
            "stopword_ratio",
            F.when(ntok > 0, stopword_hits(c).cast("double") / ntok).otherwise(F.lit(0.0)),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0-1 quality score: length-bounded, low-punct, stopword-y.

    Deliberately simple and deterministic (the point is the *pipeline
    shape* — a pure-columnar scorer that a filter can consume — not the
    specific heuristic).
    """
    feat = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3
    )
    return feat.withColumn("quality_score", F.round(score, 6))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits.

    Ties / zero hits → 'und' (undetermined). Pure column expressions —
    a ``greatest``-based argmax, no UDF, no shuffle.
    """
    hits = {lang: stopword_hits(F.col(text_col), lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    # First-match-wins on ties (stable en→fr→es→de ordering).
    pred = F.coalesce(
        *[
            F.when((hits[lang] == best) & (best > 0), F.lit(lang))
            for lang in STOPWORDS
        ],
        F.lit("und"),
    )
    return df.withColumn("lang_pred", pred)


def lang_confusion(
    df: DataFrame, gold_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Language-ID confusion matrix against a gold-label column: one
    row per (gold, predicted) cell with the doc count and the
    row-normalized share — the classifier scorecard that turns
    ``language_id`` from a feature into a measurable component
    (diagonal cells are recall; 'und' columns show coverage gaps).

    ``gold_frac`` is the raw quotient of two exact integers (cell
    count over gold-row total) — bit-identical across engines, so no
    rounding (the g_link_prediction rule for exact-integer ratios).

    Scale shape: one projection computing the argmax-of-stopword-hits
    prediction (pure column expressions, codegen) + one (gold, pred)
    aggregation — cardinality ≤ |langs|² regardless of corpus size;
    the row-total is a window over that tiny aggregate, not the data.
    """
    pred = language_id(df, text_col)
    cells = pred.groupBy(
        F.col(gold_col).alias("lang_gold"),
        F.col("lang_pred"),
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("lang_gold")
    return cells.select(
        "lang_gold",
        "lang_pred",
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double")
        ).alias("gold_frac"),
    )


def tf_idf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 1
) -> DataFrame:
    """Top-k TF-IDF terms per document, pure DataFrame ops.

    tf = term count / doc tokens; idf = ln(N / docs-containing-term).
    ONE pass over the exploded tokens: tf aggregates on (doc, term),
    then document frequency is a count window over the term partition
    of that (already shuffled-down) doc-term table. The previous shape
    — a second aggregation + broadcast join of the vocabulary — scanned
    and exploded the corpus twice (column pruning makes the two tf
    subtrees different exchanges, so Spark cannot reuse them) and
    assumed the full vocabulary fits a driver broadcast, which a
    100 TB corpus's does not. N is a single scalar count job.
    Deterministic tie-break: (tfidf DESC, term ASC).
    """
    from pyspark.sql import Window

    n_docs = df.count()
    # Materialize the token array in its own projection BEFORE the
    # explode: putting token_count(text) next to explode(tokens(text))
    # in one select re-evaluates the whole split+filter chain per
    # EXPLODED row (the Generate's project runs on its output), which
    # measured 10x slower than exploding the pre-built array and
    # taking size() of it (per-document work only).
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tk")
    ).select(
        F.col(id_col),
        F.explode("_tk").alias("term"),
        F.size("_tk").alias("_n_tokens"),
    )
    tf = toks.groupBy(id_col, "term").agg(
        (F.count(F.lit(1)) / F.first("_n_tokens")).alias("_tf")
    )
    w_term = Window.partitionBy("term")
    scored = tf.withColumn(
        "_df", F.count(F.lit(1)).over(w_term)
    ).select(
        F.col(id_col),
        "term",
        (F.col("_tf") * F.log(F.lit(float(n_docs)) / F.col("_df"))).alias(
            "_tfidf"
        ),
    )

    w = Window.partitionBy(id_col).orderBy(
        F.col("_tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            id_col,
            "term_rank",
            F.col("term").alias("top_term"),
            F.round("_tfidf", 6).alias("tfidf"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed term set
    — the standard retrieval/quality primitive a data pipeline uses for
    query-relevance filtering and benchmark mining.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)   (the +1 "robust" form,
    never negative). Docs matching no term score 0 and are omitted.

    Plan shape: the exploded token stream is filtered to the query's
    terms BEFORE any shuffle (a handful of literals — codegen
    in-filter), so the (doc, term) aggregation touches only matching
    rows; N and avgdl are one scalar aggregate; per-term df is a
    window over the tiny matched (doc, term) table. Output:
    (id, bm25) rounded to 6, deterministic.
    """
    from pyspark.sql import Window

    stats = df.select(
        F.count(F.lit(1)).alias("_n"),
        F.avg(token_count(F.col(text_col))).alias("_avgdl"),
    )
    # materialize-once before explode — same 10x pitfall as tf-idf:
    # token_count(text) beside explode() re-runs the tokenizer per
    # exploded row
    toks = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
        .select(
            F.col(id_col),
            F.size("_tk").alias("_dl"),
            F.explode("_tk").alias("term"),
        )
        .filter(F.col("term").isin([str(t) for t in query_terms]))
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    w_term = Window.partitionBy("term")
    scored = tf.withColumn(
        "_df", F.count(F.lit(1)).over(w_term)
    ).crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    denom = F.col("_tf") + k1 * (
        1.0 - b + b * F.col("_dl") / F.col("_avgdl")
    )
    term_score = idf * F.col("_tf") * (k1 + 1.0) / denom
    return (
        scored.withColumn("_s", term_score)
        .groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: ``fp_md5`` (exact) and ``fp_norm`` (md5 of
    lowercased whitespace-collapsed text — catches trivial reflows)."""
    c = F.col(text_col)
    return df.withColumn("fp_md5", F.md5(c)).withColumn(
        "fp_norm",
        F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))),
    )


# PII patterns shared by scrub_pii and its oracle. Deliberately
# restricted to the regex intersection BOTH engines (Java regex /
# RE2) evaluate identically: character classes, bounded quantifiers,
# non-capturing groups, \b — no lookaround, no backreferences, and no
# optional-prefix ambiguity that leftmost-first (Java) vs
# leftmost-longest-leaning (RE2) matching could resolve differently.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}\b"


def _pii_chain(c):
    """One sequential email → ipv4 → phone redaction round."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    until_stable: bool = False,
    max_rounds: int = 3,
) -> DataFrame:
    """Training-data PII scrub: redact emails, IPv4 addresses, and
    phone-shaped numbers to ``<EMAIL>`` / ``<IP>`` / ``<PHONE>``
    tokens, and emit per-document hit counts — the compliance pass
    every LLM corpus pipeline runs before tokenization (The Pile /
    RefinedWeb / FineWeb all ship a regex-PII stage of exactly this
    shape).

    Returns the input columns plus ``text_scrubbed``, ``n_emails``,
    ``n_ipv4``, ``n_phones``. Counts are measured on the SEQUENTIAL
    INTERMEDIATES — emails on the raw text, IPv4 on the
    email-redacted text, phones on the email+IPv4-redacted text — so
    each count is exactly the number of replacements the first
    redaction round actually performed (an IPv4 inside an email host
    is shielded by ``<EMAIL>`` and is NOT counted in ``n_ipv4``;
    earlier implementations counted every pattern on the raw text,
    which could over-report shielded spans).

    The default is single-pass, and for the shipped redaction tokens
    one pass IS a fixed point: ``<`` and ``>`` appear in no
    pattern's character class, so no match can cross a token
    boundary, no pattern matches inside a token, and the sequential
    scan already finds every same-side residual span (adversarial
    adjacency like ``a@b.coc@d.ee`` leaves ``<EMAIL>@d.ee``, whose
    tail does NOT re-match — the ``>`` shields the ``@``; verified
    by a 200k-input fuzz on Python ``re`` (the engine twin the
    property suite pins Spark against) and pytest-pinned Spark-side
    as ``scrub(scrub(x)) == scrub(x)``). Overlap-consumed fragments
    (the ``@d.ee`` tail) are redaction RESIDUE, not re-matchable
    PII. ``until_stable=True`` re-applies the full chain up to
    ``max_rounds`` times (statically unrolled — still one codegen
    projection, no data-dependent loop): a no-op today, it is the
    safety net for forks that change the token strings (a token
    whose characters re-enter a pattern's class breaks the shielding
    argument) or add patterns whose replacement can compose with
    neighbors. Counts always describe round one — later rounds could
    only ever redact redaction artifacts, not source PII.

    Scale shape: a zero-shuffle whole-stage-codegen projection — a
    handful of regexp passes per row, no Python, no join, no
    aggregation; filters above or below it still push to the scan.
    At 100 TB this is the map stage it looks like: embarrassingly
    parallel, throughput-bound on regex evaluation only.
    """
    if until_stable and max_rounds < 1:
        raise ValueError("scrub_pii: max_rounds must be >= 1")
    c = F.col(text_col)
    after_email = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    scrubbed = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    if until_stable:
        for _ in range(max_rounds - 1):
            scrubbed = _pii_chain(scrubbed)
    return (
        df.withColumn(
            "n_emails", F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), F.lit(0)))
        )
        .withColumn(
            "n_ipv4",
            F.size(F.regexp_extract_all(after_email, F.lit(PII_IPV4), F.lit(0))),
        )
        .withColumn(
            "n_phones",
            F.size(F.regexp_extract_all(after_ip, F.lit(PII_PHONE), F.lit(0))),
        )
        .withColumn("text_scrubbed", scrubbed)
    )


# Gopher rule thresholds (Rae et al. 2021, §A1.1) shared with tests.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_LINE_RATIO = 0.9
GOPHER_MAX_ELLIPSIS_LINE_RATIO = 0.3
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, §A1.1) —
    the published heuristic battery most LLM corpus pipelines start
    from (reused by MassiveText, RefinedWeb, FineWeb, Dolma): word
    count in [50, 100k], mean word length in [3, 10], symbol-to-word
    ratio (# and ``...``) ≤ 0.1, ≤90% of lines starting with a
    bullet, ≤30% of lines ending in an ellipsis, ≥80% of words with
    at least one alphabetic character, and ≥2 hits from the 8-word
    stopword list. Emits the per-document metrics, each rule's
    boolean, and the conjunction ``gopher_keep``.

    Engine-exactness: every metric is either an exact integer or a
    RAW quotient of exact integers (bit-identical across engines —
    the round()-boundary rule for small-integer ratios), and symbol
    counts use non-overlapping literal ``replace`` arithmetic, not
    regex. Empty docs (0 tokens, 0 lines) fail the word-count rule
    and emit NULL ratios rather than dividing by zero.

    Scale shape: one zero-shuffle whole-stage-codegen projection —
    token/line arrays are built once per row, every rule folds over
    them JVM-side, nothing joins, nothing aggregates.
    """
    c = F.col(text_col)
    toks = tokens(text_col)
    lines = F.filter(
        F.transform(F.split(c, r"\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )
    n_words = F.size(toks)
    n_lines = F.size(lines)
    sum_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    n_bullet_lines = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("•")
            | ln.startswith("- ")
            | ln.startswith("* "),
        )
    )
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda ln: ln.endswith("..."))
    )
    n_alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    )
    n_stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    div = lambda a, b: F.when(b > 0, a.cast("double") / b)  # noqa: E731
    out = (
        df.withColumn("n_words", n_words.cast("bigint"))
        .withColumn("mean_word_len", div(sum_len, n_words))
        .withColumn(
            "symbol_ratio", div(n_hash.cast("double") + n_ellipsis, n_words)
        )
        .withColumn("bullet_line_ratio", div(n_bullet_lines, n_lines))
        .withColumn("ellipsis_line_ratio", div(n_ellipsis_lines, n_lines))
        .withColumn("alpha_word_ratio", div(n_alpha_words, n_words))
        .withColumn("n_stop_hits", n_stop_hits.cast("bigint"))
    )
    rules = {
        "r_word_count": F.col("n_words").between(
            GOPHER_MIN_WORDS, GOPHER_MAX_WORDS
        ),
        "r_mean_word_len": F.col("mean_word_len").between(
            GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
        ),
        "r_symbol_ratio": F.col("symbol_ratio")
        <= GOPHER_MAX_SYMBOL_RATIO,
        "r_bullet_lines": F.col("bullet_line_ratio")
        <= GOPHER_MAX_BULLET_LINE_RATIO,
        "r_ellipsis_lines": F.col("ellipsis_line_ratio")
        <= GOPHER_MAX_ELLIPSIS_LINE_RATIO,
        "r_alpha_words": F.col("alpha_word_ratio")
        >= GOPHER_MIN_ALPHA_WORD_RATIO,
        "r_stopwords": F.col("n_stop_hits") >= GOPHER_MIN_STOPWORD_HITS,
    }
    keep = F.lit(True)
    for name, expr in rules.items():
        out = out.withColumn(name, F.coalesce(expr, F.lit(False)))
        keep = keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


def sentences(col: Column | str) -> Column:
    """Array of trimmed, non-empty '.'-delimited sentences.

    Pure Column expression — use with ``posexplode`` for the
    (sentence_idx, sentence) fan-out. A Python UDTF with identical
    semantics lives in tests as the custom-table-function extension
    demo; THIS native form is the hot path (codegen, no Python).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(c, r"\."), lambda p: F.trim(p)),
        lambda x: x != "",
    )


def readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    feature corpus-quality filters threshold on (higher = simpler
    prose): 206.835 − 1.015·(words/sentences) − 84.6·(syllables/word).
    Syllables are the standard vowel-group heuristic: runs of
    ``[aeiouy]+`` per lowercased token, min 1 per word.

    Engine-exactness: all three counts are exact integers; the two
    ratios are raw IEEE quotients of exact integers (bit-identical —
    the exact-integer-ratio rule), and the final linear combination
    applies the same literal coefficients in the same expression
    order in both engines — emitted raw, never rounded. Documents
    with no words or no sentences yield NULL (guarded; ANSI-mode
    integer division by zero throws).

    Scale shape: one projection — token array built once, integer
    folds over it, no explode, no shuffle; Catalyst prunes the scan
    to the text column.
    """
    c = F.col(text_col)
    toks = tokens(c)
    syll = F.aggregate(
        F.transform(
            toks,
            lambda t: F.greatest(
                F.lit(1),
                F.size(F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"), 0)),
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    out = df.select(
        "*",
        F.size(toks).cast("bigint").alias("n_words"),
        F.size(sentences(c)).cast("bigint").alias("n_sentences"),
        syll.cast("bigint").alias("n_syllables"),
    )
    wps = F.when(
        F.col("n_sentences") > 0,
        F.col("n_words") / F.col("n_sentences"),
    )
    spw = F.when(
        F.col("n_words") > 0,
        F.col("n_syllables") / F.col("n_words"),
    )
    return out.select(
        "*",
        wps.alias("words_per_sentence"),
        spw.alias("syllables_per_word"),
        (
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
        ).alias("flesch"),
    )


def ngrams_from_tokens(toks: Column, n: int = 2) -> Column:
    """ALL space-joined n-grams of a token-array column, duplicates
    kept ([] for arrays shorter than n). The single n-gram
    construction repetition scoring and contamination checking both
    build on — one place for the short-doc guard: Spark's
    ``sequence(1, 0)`` DESCENDS, so an unguarded sequence would
    fabricate phantom grams.

    Construction note: the grams come from ``arrays_zip`` of n shifted
    slices, with the transform lambda touching ONLY its element
    variable. Expressions captured inside a higher-order-function
    lambda are re-evaluated PER ELEMENT — an index-based form
    (``element_at(toks, i)``) lets CollapseProject inline the
    tokenizer into the lambda and re-split the whole document once
    per gram (measured ~6x on the repetition query at sf0.1). As
    zip arguments, the slices (and any inlined tokenizer) evaluate
    once per ROW regardless of gram count.
    """
    m = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice(toks, j + 1, m).alias(f"_g{j}") for j in range(n)]
    )
    grams = F.transform(
        zipped,
        lambda s: F.concat_ws(" ", *[s[f"_g{j}"] for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def adjacent_pairs(
    toks: Column | str, left: str = "w1", right: str = "w2"
) -> Column:
    """Array of struct(left, right) ADJACENT element pairs of a
    STRING token array ([] under 2 elements) — the shifted-slice
    ``arrays_zip`` construction shared by the bigram LM and BPE pair
    counting (one place for the guard against Spark's DESCENDING
    ``sequence(1, 0)`` fabricating phantom pairs; see
    ``ngrams_from_tokens``). String-only by contract: the empty-array
    branch is cast to string structs, so a non-string element type
    fails analysis — stage a cast first if you need one."""
    c = F.col(toks) if isinstance(toks, str) else toks
    m = F.size(c) - 1
    return F.when(
        F.size(c) >= 2,
        F.arrays_zip(
            F.slice(c, 1, m).alias(left), F.slice(c, 2, m).alias(right)
        ),
    ).otherwise(F.array().cast(f"array<struct<{left}:string,{right}:string>>"))


def word_ngrams_all(col: Column | str, n: int = 2) -> Column:
    """Convenience form over raw text — inherits the per-element
    re-tokenization cost inside the transform lambda (see
    ``ngrams_from_tokens``); hot paths stage the token array first."""
    return ngrams_from_tokens(tokens(col), n)


def word_bigrams(col: Column | str) -> Column:
    """Adjacent word pairs as 'a b' strings ([] for <2 tokens)."""
    return word_ngrams_all(col, 2)


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_word_max: float = 0.3,
    top_bigram_max: float = 0.18,
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    arXiv:2112.11446 §A1.1: "repetitious documents are ... removed"):
    boilerplate and degenerate generations show up as a few tokens /
    n-grams dominating the document.

    * ``dup_word_frac`` — 1 - distinct/total words: pure per-row
      Column arithmetic, no shuffle.
    * ``top_bigram_frac`` — most frequent bigram's share of all
      bigrams: explode → count keyed on (doc, bigram) → per-doc max.
      Both shuffles are map-side combinable and keyed by doc, so the
      reduce input is O(distinct bigrams), never O(corpus tokens).
    * ``is_repetitive`` — either signal over its threshold; tune
      per-corpus.

    Scale note: this is deliberately NOT computed with a per-row
    quadratic ``aggregate`` over the token array — a single pathological
    100 MB document would pin one core for hours; the explode/agg form
    spreads that document's n-grams across the cluster.
    """
    # Stage the token array and widen narrow inputs: a small parquet
    # file arrives as ONE split, which serializes the explode+agg onto
    # a single core (the dominant cost before this — 14s single-task
    # vs sub-second spread at sf0.1); the repartition's exchange also
    # materializes `_toks`, so downstream lambdas read an attribute.
    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        ensure_min_partitions,
    )

    staged = ensure_min_partitions(
        df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    )
    n_toks = F.size("_toks")
    base = staged.select(
        F.col(id_col),
        n_toks.alias("n_words"),
        F.round(
            F.when(n_toks == 0, 0.0).otherwise(
                1 - F.size(F.array_distinct("_toks")) / n_toks
            ),
            6,
        ).alias("dup_word_frac"),
        ngrams_from_tokens(F.col("_toks"), 2).alias("_bigrams"),
    )
    counts = (
        base.select(id_col, F.explode("_bigrams").alias("_bg"))
        .groupBy(id_col, "_bg")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    per_doc = counts.groupBy(id_col).agg(
        F.max("_n").alias("_top_bg"), F.sum("_n").alias("_n_bg")
    )
    out = (
        base.drop("_bigrams")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_words",
            "dup_word_frac",
            F.round(
                F.coalesce(
                    F.col("_top_bg") / F.col("_n_bg"), F.lit(0.0)
                ),
                6,
            ).alias("top_bigram_frac"),
        )
    )
    return out.withColumn(
        "is_repetitive",
        (F.col("dup_word_frac") > dup_word_max)
        | (F.col("top_bigram_frac") > top_bigram_max),
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram-LM cross-entropy per document — the CCNet-style quality
    signal (Wenzek et al. 2020): train an add-one-smoothed bigram model
    on the corpus itself, then score each doc by the average negative
    log-probability of its bigrams (nats). Low = fluent/common phrasing,
    high = rare/garbled text; filter or re-weight on it.

    Output: (id, n_bigrams, round(cross_entropy, 6)); docs with < 2
    tokens have n_bigrams = 0 and NULL cross_entropy.

    Scale shape (everything map-side-combines before it shuffles):

    * bigram/unigram COUNT tables: explode → groupBy — the shuffle
      carries one row per (partition, gram), not per occurrence.
    * scoring joins occurrences to the two count tables on their gram
      keys. The count side has exactly one row per key, so skew on
      stopword bigrams ("of the") is join-side only — AQE skew split
      covers it; no pre-broadcast because a corpus-wide count table
      does not fit an executor at 100 TB.
    * vocabulary size V is a 1-row aggregate, broadcast-crossJoined.

    The model is trained on the SAME corpus it scores, so every scored
    bigram exists in the count table (inner joins lose nothing); the
    add-one smoothing keeps the construction total (P sums to 1 over
    the vocab) without changing that.
    """
    staged = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    pairs = adjacent_pairs("_toks")
    occ = staged.select(F.col(id_col), F.explode(pairs).alias("_bg")).select(
        F.col(id_col),
        F.col("_bg.w1").alias("w1"),
        F.col("_bg.w2").alias("w2"),
    )
    bigram_counts = occ.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_cb")
    )
    unigram_counts = (
        staged.select(F.explode("_toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("_cu"))
    )
    vocab = unigram_counts.agg(F.count(F.lit(1)).alias("_v"))
    scored = (
        occ.join(bigram_counts, ["w1", "w2"])
        .join(unigram_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log(F.col("_cu") + F.col("_v"))
                    - F.log(F.col("_cb") + 1)
                ),
                6,
            ).alias("cross_entropy"),
        )
    )
    return (
        staged.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "cross_entropy",
        )
    )


def sparse_nn_tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float = 1.0,
    query_pred: Column | None = None,
) -> DataFrame:
    """Each document's single nearest neighbor by TF-IDF cosine — the
    lexical (sparse-vector) twin of the embedding top-k family, via an
    inverted-index join instead of dense dot products.

    tf = term count / doc tokens; idf = ln(N / docs-containing-term);
    cosine = Σ_t w_a(t)·w_b(t) / (‖w_a‖·‖w_b‖), accumulated ONLY over
    shared terms by joining the postings list against itself on the
    term — the classic inverted-index similarity join: a pair is ever
    scored only if it shares a term, so disjoint-vocabulary pairs cost
    nothing (dense top-k scores every pair regardless).

    Scale shape: postings (doc, term, weight) self-join on term — the
    shuffle key is the TERM, so hot terms are the skew axis; the
    ``max_df_frac`` knob drops terms present in more than that
    fraction of documents BEFORE the join (a term in f·N docs alone
    creates (f·N)² candidate pairs while contributing ~ln(1/f)≈0
    weight — stop-terms are quadratic cost for near-zero signal).
    The per-doc top-1 is a window over the pair scores. Deterministic
    tie-break: (rounded cosine DESC, neighbor id ASC).

    ``query_pred`` (a predicate over the frame's columns) restricts
    the QUERY side of the join — neighbors still come from the whole
    corpus, and idf/norms are corpus-wide. This is the load-bearing
    knob on corpora whose vocabulary is dense (every term in most
    docs): there the postings join degenerates to all-pairs — df·N
    candidates per term is quadratic cost that no exact algorithm
    avoids when every pair genuinely shares terms (measured 181 s
    corpus-wide vs <2 s for a 100-doc query set at sf0.1) — so
    corpus-wide NN is only affordable on Zipfian vocabularies with
    ``max_df_frac`` pruning, while query-set-vs-corpus stays linear
    in |queries|·df regardless of corpus shape.
    """
    from pyspark.sql import Window

    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        ensure_min_partitions,
    )

    n_docs = df.count()
    src = ensure_min_partitions(df.select(id_col, text_col))
    toks = src.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tk")
    ).select(
        F.col(id_col),
        F.explode("_tk").alias("term"),
        F.size("_tk").alias("_n_tokens"),
    )
    tf = toks.groupBy(id_col, "term").agg(
        (F.count(F.lit(1)) / F.first("_n_tokens")).alias("_tf")
    )
    w_term = Window.partitionBy("term")
    posting = (
        tf.withColumn("_df", F.count(F.lit(1)).over(w_term))
        .filter(F.col("_df") <= F.lit(max_df_frac) * F.lit(float(n_docs)))
        .select(
            F.col(id_col).alias("_id"),
            "term",
            (
                F.col("_tf")
                * F.log(F.lit(float(n_docs)) / F.col("_df"))
            ).alias("_w"),
        )
    )
    # Three consumers (both join sides + norms) read the postings;
    # without this the explode+window lineage executes three times —
    # the self-join's two sides do not share an exchange (different
    # aliases) and norms re-partitions by _id. At warehouse scale the
    # equivalent is materializing the postings to a table once.
    # (durability follows spark.foodPipeline.checkpointMode)
    posting = _ckpt(posting, eager=False)
    norms = posting.groupBy("_id").agg(
        F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_norm")
    )
    query_side = (
        posting if query_pred is None
        else posting.filter(query_pred)
    )
    dots = (
        query_side.alias("a")
        .join(
            posting.alias("b"),
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a._id") != F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias("_ida"), F.col("b._id").alias("_idb")
        )
        .agg(F.sum(F.col("a._w") * F.col("b._w")).alias("_dot"))
    )
    scored = (
        dots.join(norms.withColumnRenamed("_id", "_ida"), "_ida")
        .withColumnRenamed("_norm", "_na")
        .join(norms.withColumnRenamed("_id", "_idb"), "_idb")
        .withColumnRenamed("_norm", "_nb")
        .select(
            "_ida",
            "_idb",
            F.round(
                F.col("_dot") / (F.col("_na") * F.col("_nb")), 6
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("_ida").orderBy(
        F.col("cosine_sim").desc(), F.col("_idb")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_ida").alias(id_col),
            F.col("_idb").alias("nn_doc_id"),
            "cosine_sim",
        )
    )


def zipf_profile(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = "source",
    min_rank_terms: int = 5,
) -> DataFrame:
    """Zipf rank-frequency fit per group: OLS slope of
    ``ln(freq) ~ ln(rank)`` over the group's word-frequency table
    (natural text sits near slope -1; a flat slope flags synthetic or
    templated corpora — a standard corpus-forensics signal alongside
    [[t_repetition]]-style duplication checks).

    Two aggregations + one window, all keyed by group: explode words
    -> (group, word) counts -> rank by (freq DESC, word) inside each
    group (the vocabulary frame, far smaller than the token stream,
    is all the window ever sorts) -> single-pass ``regr_slope`` +
    ``regr_r2`` per group. The deterministic word tie-break makes the
    rank — and therefore the fit — a pure function of the input,
    which is what lets the SQL oracle reproduce it bit-for-bit.
    Groups with fewer than ``min_rank_terms`` distinct words are
    dropped (a 2-point fit is noise, and r2 degenerates).
    """
    from pyspark.sql import Window

    g = F.col(group_col) if group_col else F.lit("all")
    words = df.select(
        g.alias("grp"), F.explode(tokens(text_col)).alias("word")
    )
    freq = words.groupBy("grp", "word").agg(
        F.count(F.lit(1)).alias("freq")
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("freq").desc(), F.col("word")
    )
    ranked = freq.withColumn("rank", F.row_number().over(w))
    fitted = (
        ranked.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("freq").alias("n_tokens"),
            F.round(
                F.regr_slope(
                    F.log(F.col("freq").cast("double")),
                    F.log(F.col("rank").cast("double")),
                ),
                6,
            ).alias("zipf_slope"),
            F.round(
                F.regr_r2(
                    F.log(F.col("freq").cast("double")),
                    F.log(F.col("rank").cast("double")),
                ),
                6,
            ).alias("fit_r2"),
        )
        .filter(F.col("n_terms") >= min_rank_terms)
    )
    return fitted.select(
        F.col("grp").alias(group_col if group_col else "grp"),
        "n_terms",
        "n_tokens",
        "zipf_slope",
        "fit_r2",
    )


def distinctive_terms(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    k: int = 10,
    min_count: int = 5,
) -> DataFrame:
    """Per-source distinctive vocabulary: the k terms whose usage RATE
    in a source most exceeds their rate in the rest of the corpus
    (the Monroe et al. 2008 "fightin' words" rate-ratio family, with
    add-one smoothing on the complement so unseen-elsewhere terms
    stay finite).

    ratio = (a / b) / ((c + 1) / (d + 1)) computed as
    (a·(d+1)) / (b·(c+1)) — a single division of two products of
    EXACT integers, evaluated in fixed-shape IEEE double arithmetic,
    so the score (and therefore the ranking) is bit-reproducible
    across engines with no rounding step. a = term count in source,
    b = source tokens, c = term count elsewhere, d = tokens elsewhere.

    Scale shape: ONE explode pass; (source, term) counts aggregate
    with map-side combine; the term and source totals are windows
    over the already-aggregated (small) counts frame — never a second
    corpus scan; the corpus total is one scalar job on that frame.
    Per-source top-k is a bounded row_number window keyed by source.
    ``min_count`` prunes the long hapax tail before ranking — at
    corpus scale that is the difference between ranking millions of
    noise terms and the meaningful vocabulary.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    # Materialize the aggregated counts (eager localCheckpoint): the
    # corpus-total collect below would otherwise re-run the whole
    # explode+shuffle lineage a second time when the returned frame
    # executes (per is the post-aggregation frame — vocab-sized).
    # A checkpoint, not persist(): blocks release with the returned
    # frame's lineage instead of holding a session-lifetime cache
    # entry no caller ever unpersists.
    per = _ckpt(
        toks.groupBy("source", "term").agg(
            F.count(F.lit(1)).alias("n_in_source")
        )
    )
    total = per.agg(F.sum("n_in_source")).collect()[0][0] or 0
    w_term = Window.partitionBy("term")
    w_src = Window.partitionBy("source")
    a = F.col("n_in_source")
    b = F.sum("n_in_source").over(w_src)
    tt = F.sum("n_in_source").over(w_term)
    scored = per.select(
        "source",
        "term",
        "n_in_source",
        (
            (a.cast("double") * (F.lit(total) - b + 1).cast("double"))
            / (b.cast("double") * (tt - a + 1).cast("double"))
        ).alias("ratio"),
    ).filter(F.col("n_in_source") >= min_count)
    w = Window.partitionBy("source").orderBy(
        F.col("ratio").desc(), F.col("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select("source", "term_rank", "term", "n_in_source", "ratio")
    )


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    max_phrase_len: int = 4,
    lang: str = "en",
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs (gaps-and-islands over token
    positions); each word scores degree/frequency (degree = total
    length of phrases it appears in, frequency = its occurrence
    count), and a phrase scores the sum of its words' scores. Returns
    the corpus-level top-``k`` phrases by (score DESC, phrase) with
    their occurrence counts — the unsupervised "what is this corpus
    about" extractor that needs no model artifacts.

    Reproducibility: degree/freq are exact integers; the per-phrase
    score sums <= ``max_phrase_len`` exact ratios and rounds to 6
    decimals before the top-k rank, so ordering compares
    engine-identical doubles with a phrase-text tie-break.

    Scale shape: one posexplode pass (rows ∝ corpus tokens), islands
    via a per-document keyed window (parallel per-key sorts), word
    stats via one combinable aggregation broadcast back onto the
    (distinct-word ∝ vocabulary) frame, and a TakeOrderedAndProject
    top-k — no global sort, no all-pairs.
    """
    if lang not in STOPWORDS:
        raise ValueError(f"rake_keywords: no stopword list for {lang!r}")
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_w"),
    ).filter(~F.array_contains(sw, F.col("_w")))
    wd = Window.partitionBy("_id").orderBy("_pos")
    islands = toks.withColumn(
        "_grp", F.col("_pos") - F.row_number().over(wd)
    )
    phrases = (
        islands.groupBy("_id", "_grp")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_w")))
                ),
                lambda s: s["_w"],
            ).alias("_words")
        )
        .filter(F.size("_words") <= max_phrase_len)
        .select(
            F.array_join("_words", " ").alias("phrase"),
            "_words",
            F.size("_words").alias("_plen"),
        )
    )
    occ = phrases.select(
        "phrase", "_plen", F.explode("_words").alias("_w")
    )
    word_stats = occ.groupBy("_w").agg(
        F.count(F.lit(1)).alias("_freq"),
        F.sum("_plen").alias("_deg"),
    )
    scored = (
        occ.join(F.broadcast(word_stats), "_w")
        .groupBy("phrase", "_plen")
        .agg(
            (F.count(F.lit(1)) / F.col("_plen"))
            .cast("long")
            .alias("n_occurrences"),
            F.round(
                F.sum(F.col("_deg") / F.col("_freq"))
                / (F.count(F.lit(1)) / F.col("_plen")),
                6,
            ).alias("score"),
        )
    )
    return (
        scored.select("phrase", "n_occurrences", "score")
        .orderBy(F.col("score").desc(), "phrase")
        .limit(k)
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Pointwise-mutual-information collocations: adjacent token pairs
    whose co-occurrence beats the independence expectation,
    PMI = ln(c(w1,w2) * T / (c_left(w1) * c_right(w2))) over bigram
    totals — the classic collocation extractor (Church & Hanks 1990).
    ``min_count`` suppresses the tiny-count PMI explosion (a pair seen
    once between two hapaxes maxes the score); top-``k`` by
    (PMI DESC, w1, w2).

    Reproducibility: all counts are exact integers, ln takes an
    exact-integer ratio (the q_entropy_profile contract), and the
    score rounds to 6 decimals before the deterministic rank.

    Scale shape: bigrams come from one per-document lead window over
    posexploded tokens (parallel per-key sorts, rows ∝ corpus
    tokens); marginals are combinable aggregations joined back keyed
    on the word (vocabulary-sized); top-k is TakeOrderedAndProject.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_w"),
    )
    wd = Window.partitionBy("_id").orderBy("_pos")
    bi = toks.select(
        F.col("_w").alias("w1"),
        F.lead("_w").over(wd).alias("w2"),
    ).filter(F.col("w2").isNotNull())
    pair = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    left = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("_nl"))
    right = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("_nr"))
    total = bi.agg(F.count(F.lit(1)).alias("_t"))
    pmi = F.round(
        F.log(
            F.col("n_pair").cast("double")
            * F.col("_t")
            / (F.col("_nl").cast("double") * F.col("_nr"))
        ),
        6,
    )
    return (
        pair.filter(F.col("n_pair") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "n_pair", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )


def vocab_profile(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source lexical-diversity profile: token count, vocabulary
    size (distinct types), hapax count (types seen exactly once),
    type-token ratio, and hapax share — the quick corpus-quality
    signals (near-zero TTR flags boilerplate/template floods; an
    outlier hapax share flags OCR noise or junk tokenization). A
    rising-TTR source mixed into a falling-TTR one is also the first
    visible symptom of corpus contamination by generated text.

    Reproducibility: every output is an exact integer or an
    exact-integer ratio emitted RAW (never rounded — integer ratios
    terminate on round()'s half boundary).

    Scale shape: one explode pass, one combinable (source, token)
    count, one per-source rollup — nothing wider than the vocabulary
    crosses a shuffle twice.
    """
    toks = df.select(
        F.col(source_col).alias("_src"),
        F.explode(tokens(F.col(text_col))).alias("_w"),
    )
    counts = toks.groupBy("_src", "_w").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        counts.groupBy("_src")
        .agg(
            F.sum("_n").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("_n") == 1, 1).otherwise(0)).alias(
                "n_hapax"
            ),
        )
        .select(
            F.col("_src").alias("source"),
            "n_tokens",
            "n_types",
            "n_hapax",
            (F.col("n_types") / F.col("n_tokens")).alias(
                "type_token_ratio"
            ),
            (F.col("n_hapax") / F.col("n_types")).alias("hapax_share"),
        )
    )
