"""Text analysis operators — language ID, quality scoring, token counting,
document fingerprinting.  Pure declarative SQL (codegen'd, zero shuffle),
designed to annotate trillions of documents as a narrow projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# tiny per-language stopword lists for the n-gram/stopword-ratio heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "pour", "que", "dans"],
}


def _tokens(col) -> Column:
    # canonical whitespace tokenization — dedup.normalize_text pins the
    # whitespace class (\x0B differs between Java \s and DuckDB RE2 \s)
    # and trims AFTER the collapse so "\thello" yields no empty token
    from text2nkg_spark.operators.dedup import normalize_text

    return F.split(normalize_text(col), " ")


def language_scores(text_col) -> Column:
    """map<lang, stopword-hit-ratio> — the classic cheap langid heuristic."""
    toks = _tokens(text_col)
    entries = [
        F.struct(
            F.lit(lang).alias("lang"),
            (F.size(F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in words])))
             / F.greatest(F.size(toks), F.lit(1))).alias("score"),
        )
        for lang, words in _STOPWORDS.items()
    ]
    return F.array(*entries)


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``lang_pred`` + ``lang_score`` (best stopword-ratio language;
    'und' when nothing scores above zero)."""
    scored = df.withColumn("_ls", language_scores(F.col(text_col)))
    best = F.array_max(
        F.transform("_ls", lambda s: F.struct(
            s["score"].alias("score"), s["lang"].alias("lang"))))
    return (
        scored.withColumn(
            "lang_pred",
            F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")))
        .withColumn("lang_score", best["score"])
        .drop("_ls")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / word-shape quality signals."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_tok = F.size(toks)
    return (
        df.withColumn("n_chars", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "mean_word_len",
            F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
            / F.greatest(n_tok, F.lit(1)).cast("double"))
        .withColumn(
            "punct_ratio",
            (F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", "")))
            / F.greatest(F.length(t), F.lit(1)).cast("double"))
        .withColumn(
            "stopword_ratio",
            F.size(F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in _STOPWORDS["en"]])))
            / F.greatest(n_tok, F.lit(1)).cast("double"))
        .withColumn(
            "uniq_token_ratio",
            F.size(F.array_distinct(toks))
            / F.greatest(n_tok, F.lit(1)).cast("double"))
        .withColumn(
            "quality_score",
            F.least(F.lit(1.0), n_tok / F.lit(100.0)) * 0.4
            + F.col("uniq_token_ratio") * 0.4
            + (F.lit(1.0) - F.col("punct_ratio")) * 0.2)
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (regex pieces:
    letter-runs, digit-runs, and single non-alnum marks, ~GPT-2 pretokens)."""
    t = F.col(text_col)
    pieces = F.regexp_extract_all(
        F.lower(t), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return (
        df.withColumn("ws_tokens", F.size(_tokens(t)))
        .withColumn("subword_pieces", F.size(pieces))
        .withColumn(
            "est_bpe_tokens",
            (F.col("subword_pieces")
             + F.aggregate(
                 pieces, F.lit(0),
                 lambda a, p: a + F.when(F.length(p) > 6, 1).otherwise(0))))
    )


def fingerprint(df: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Winnowing-style document fingerprint: min + max + xor of rolling
    word-n-gram hashes — order-insensitive, locality-sensitive enough for
    shard-level regression diffs."""
    toks = _tokens(F.col(text_col))
    grams = F.filter(
        F.transform(
            toks,
            lambda _x, i: F.when(
                i + n <= F.size(toks),
                F.xxhash64(F.array_join(F.slice(toks, i + 1, n), " "))),
        ),
        lambda h: h.isNotNull(),
    )
    return (
        df.withColumn("fp_min", F.array_min(grams))
        .withColumn("fp_max", F.array_max(grams))
        .withColumn(
            "fp_xor",
            F.aggregate(grams, F.lit(0).cast("long"),
                        lambda a, h: a.bitwiseXOR(h)))
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition quality signals per document: most-frequent
    unigram/bigram mass and the distinct-word ratio — the standard filters
    for boilerplate- and loop-generated text in LLM corpus prep (docs
    whose top bigram covers a large fraction of all bigrams are
    template/spam-like).

    Definition is total-ordered and retry-stable: the top gram is the
    highest count with ties broken by the lexicographically SMALLEST gram.
    Fractions are single IEEE divisions of exact integers (bit-stable in
    any engine — no logs, no accumulation order).

    Shape: per gram size, one (doc, gram) hash count (partial agg
    map-side) then one per-doc agg where ``min(struct(-n, gram))`` picks
    the top gram without a window sort — two keyed shuffles per gram
    size, linear in corpus size; the 100 TB shape.  Docs with a single
    word have no bigrams: left join, bigram columns NULL.  Empty /
    whitespace-only docs emit NO rows (split('') would otherwise yield
    empty-string "words" and score a contentless doc as maximally
    diverse).  normalize_text now trims AFTER collapsing, so a
    tab/newline-only doc normalizes to '' and the filter is a plain
    inequality.
    """
    from text2nkg_spark.operators.dedup import exploded_word_ngrams, \
        normalize_text

    df = df.where(normalize_text(F.col(text_col)) != "")

    def top_agg(n: int, prefix: str) -> DataFrame:
        cnt = (
            exploded_word_ngrams(df, id_col, text_col, n)
            .groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).alias("n")))
        best = F.min(F.struct(
            (-F.col("n")).alias("neg"), F.col("gram").alias("g")))
        return (
            cnt.groupBy("doc_id")
            .agg(F.sum("n").alias(f"n_{prefix}"),
                 F.count(F.lit(1)).alias(f"n_distinct_{prefix}"),
                 best.alias("_b"))
            .select(
                "doc_id", f"n_{prefix}", f"n_distinct_{prefix}",
                F.col("_b.g").alias(f"top_{prefix[:-1]}"),
                (-F.col("_b.neg")).alias(f"top_{prefix[:-1]}_n")))

    uni = top_agg(1, "words")
    bi = top_agg(2, "bigrams")
    return (
        uni.join(bi, "doc_id", "left")
        .withColumn("top_word_frac", F.col("top_word_n") / F.col("n_words"))
        .withColumn("top_bigram_frac",
                    F.col("top_bigram_n") / F.col("n_bigrams"))
        .withColumn("distinct_word_ratio",
                    F.col("n_distinct_words") / F.col("n_words"))
    )


def contamination_overlap(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination check: for each candidate document, the
    fraction of its DISTINCT word ``n``-gram shingles that appear anywhere
    in the benchmark corpus — the standard train/eval overlap scan run
    before training on a scraped corpus.

    Scale shape: eval benchmarks are MBs while the corpus is the big
    side, so the benchmark's distinct shingle set BROADCASTS and the
    candidate side never shuffles for the membership probe — the only
    wide operations are the candidate's own (doc, gram) distinct and the
    per-doc count, both keyed hash aggregations.  Docs with fewer than
    ``n`` words have no shingles and drop out (no rows).
    """
    from text2nkg_spark.operators.dedup import exploded_word_ngrams

    bench = (
        exploded_word_ngrams(bench_df, id_col, text_col, n)
        .select("gram").distinct()
        .withColumn("_hit", F.lit(1)))
    cand = (
        exploded_word_ngrams(df, id_col, text_col, n)
        .select("doc_id", "gram").distinct())
    return (
        cand.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"),
             F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
             .cast("long").alias("n_overlap"))
        .withColumn("overlap_frac", F.col("n_overlap") / F.col("n_shingles"))
        .withColumn("contaminated", F.col("overlap_frac") >= threshold)
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 3,
) -> DataFrame:
    """Per-document top-``k`` keyword terms by TF-IDF with reciprocal-df
    weighting: score = tf / df (both exact integers; the division is a
    single IEEE op, so the ranking reproduces bit-for-bit in any engine —
    log-scaled idf variants are NOT cross-engine stable and monotone
    transforms of df preserve the per-term ordering anyway).

    Shape: explode -> (doc, term) count -> term document-frequency join ->
    per-doc rank.  Both aggregates are partial-agg hash groupBys; the
    df join is a plain shuffle join keyed on the term (broadcast would
    ship the whole vocabulary).  Ties break on the term string, so the
    top-k set is total-ordered and retry-stable.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    ).where(F.length("term") >= min_token_len)
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.col("tf") / F.col("df")), F.asc("term"))
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df",
                F.col("rank").cast("int").alias("rank"))
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_len: int = 3,
    max_df: int = 64,
    idf_scale: int = 100,
    top_k: int = 5,
) -> DataFrame:
    """Sparse pairwise TF-IDF cosine similarity via an INVERTED INDEX —
    the third similarity family next to MinHash (set overlap) and dense
    embeddings (ANN): ``(doc_id, partner, cosine, rank)``, top-``top_k``
    partners per document.

    Every number is engine-exact:

    * weights are INTEGERS — ``w(d,t) = tf * ((N * idf_scale) DIV df)``
      over the pruned vocabulary (terms with ``df <= max_df``); integer
      idf preserves the idf ordering without log()'s last-ulp libm drift,
    * dot products and squared norms are exact integer sums,
    * the final cosine is ``CAST(dot) / (sqrt(n2_a) * sqrt(n2_b))`` —
      three IEEE-correctly-rounded double ops in a fixed order, so the
      DuckDB twin reproduces each float bit-for-bit.

    Scale shape: the pair generator is a TERM-keyed equi-self-join over
    postings whose width the ``max_df`` prune bounds at df^2/2 pairs per
    term — common terms (the quadratic blowup AND the least informative
    signal) never enter the index, the same reasoning as every other
    bounded pair generator here (dedup.cap_bucket_width).  All stages are
    partial-agg hash groupBys or keyed shuffle joins; the only driver
    value is the doc count N (one bounded ``first()``).

    EAGER (r7): the postings table is localCheckpoint-ed at call time (it
    feeds four consumers — see inline note), so calling this function
    runs the token scan once and the returned pairs are frozen as of the
    call — the same contract as simhash_pairs / edit1_fuzzy_pairs.
    Overflow: per-doc ``sum(w^2)`` must stay under 2^63 — shrink
    ``idf_scale`` (even 1 keeps weights exact integers) as N grows; ANSI
    mode fails loud rather than wrapping.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    ).where(F.length("term") >= min_token_len)
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"))
    # EAGER (r7): the (doc, term, tf) postings feed FOUR consumers (the
    # doc count, the document-frequency aggregate, and both sides of the
    # term self-join through w) — without a lineage cut the token scan +
    # first groupBy plan quadruples and a fresh query's Catalyst analysis
    # alone was measured at 11-35 s at sf0.1.  localCheckpoint computes
    # the scan once; at 100 TB the postings list is linear in corpus
    # tokens — the same materialize-once shape as simhash_pairs.  Same
    # call-time-execution contract as the other EAGER pair generators.
    tf = tf.localCheckpoint()
    n = tf.select(F.countDistinct("doc_id")).first()[0]
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    vocab = dfreq.where(F.col("df") <= max_df)
    w = (
        tf.join(vocab, "term")
        .select(
            "doc_id", "term",
            # N is a driver scalar now (same countDistinct, one bounded
            # first()); the weight arithmetic is unchanged int64
            (F.col("tf")
             * F.expr(f"({int(n)} * {idf_scale}L) div df")).alias("w"))
    )
    # second cut: w feeds norms AND both self-join sides
    w = w.localCheckpoint()
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("n2"))
    pairs = (
        w.alias("a")
        .join(w.alias("b"),
              (F.col("a.term") == F.col("b.term"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"),
                 F.col("b.doc_id").alias("db"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    cos = (
        pairs
        .join(norms.select(F.col("doc_id").alias("da"),
                           F.col("n2").alias("n2a")), "da")
        .join(norms.select(F.col("doc_id").alias("db"),
                           F.col("n2").alias("n2b")), "db")
        .select(
            "da", "db",
            (F.col("dot").cast("double")
             / (F.sqrt(F.col("n2a").cast("double"))
                * F.sqrt(F.col("n2b").cast("double")))).alias("cosine"))
    )
    und = cos.select(
        F.explode(F.array(
            F.struct(F.col("da").alias("doc_id"),
                     F.col("db").alias("partner"), F.col("cosine")),
            F.struct(F.col("db").alias("doc_id"),
                     F.col("da").alias("partner"), F.col("cosine")),
        )).alias("_p")
    ).select("_p.doc_id", "_p.partner", "_p.cosine")
    rk = Window.partitionBy("doc_id").orderBy(
        F.desc("cosine"), F.asc("partner"))
    return (
        und.withColumn("rank", F.row_number().over(rk))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "partner", "cosine",
                F.col("rank").cast("int").alias("rank"))
    )


# PII patterns pinned to the syntax both Java regex and RE2 (DuckDB)
# interpret identically: no lookarounds, no backrefs, explicit classes.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
) -> DataFrame:
    """PII redaction — the corpus-prep step every LLM training pipeline
    runs before anything else (no reference analogue; SURVEY.md §2.9
    training-data family): emails and NANP-style phone numbers are
    counted and replaced with stable placeholder tokens.

    Adds ``n_emails``/``n_phones`` (match counts on the ORIGINAL text)
    and ``redacted`` (emails replaced first, then phones — an email is
    never half-eaten by the phone pattern).  Because the counts run on
    the original text, a phone-shaped substring INSIDE an email local
    part ('555-123-4567@x.com') counts as a phone but is consumed by
    the email replacement — n_phones is "phone patterns observed", NOT
    "``<PHONE>`` tokens emitted"; don't reconcile the two.  Pure native ``regexp_count``
    / ``regexp_replace`` projections: zero shuffle, codegen'd, linear
    scan — annotating a 100 TB corpus is exactly one pass.  The patterns
    avoid every Java-vs-RE2 divergence (no ``\\d``-vs-unicode-digit
    ambiguity: explicit ``[0-9]``; no word boundaries) so the DuckDB
    oracle matches byte-for-byte.
    """
    t = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(t, PII_EMAIL_RE, email_token),
        PII_PHONE_RE, phone_token)
    return (
        df.withColumn("n_emails",
                      F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("long"))
        .withColumn("n_phones",
                    F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("long"))
        .withColumn("redacted", red)
    )
