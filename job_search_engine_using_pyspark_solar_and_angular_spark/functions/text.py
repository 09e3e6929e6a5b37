"""Text column functions: tokenizers, normalization, cleaning chains.

Reproduces the capability set of the reference's two analyzer families and its
regex-cleaning chains (SURVEY.md §2.8 T1-T10, N1-N4/N8, R2) as pure
``pyspark.sql.functions`` Column expressions — JVM-side, codegen-friendly,
no Python UDFs anywhere.

Reference parity notes (file:line into /root/reference):
- classic whitespace tokenization ~ Solr ClassicTokenizer configured at
  ``Ranking Model/src/main/java/Utils/SolrFieldType.java:39-45``.
- clean_text chain ~ notebook cell 7 of ``Spark/Word_cloud_evaluation.ipynb``
  (entity/url/mention/hashtag strip + whitespace collapse).
- twitter timestamp parse ~ ``Spark/Tweets_preprocessing.py:124-128,451-455``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default stopword list used by the declared queries (Q18) — deliberately tiny
# and explicit so the DuckDB oracle states the identical list.
BASIC_STOPWORDS = ("the", "a", "of", "and", "to")


def tokenize_ws(col: Column | str) -> Column:
    """Whitespace tokenizer: text -> array<string> (reference N2)."""
    return F.split(F.col(col) if isinstance(col, str) else col, " ")


def normalize_token(tok: Column) -> Column:
    """Lowercase + strip non-alphanumerics from a single token (reference N3)."""
    return F.regexp_replace(F.lower(tok), "[^a-z0-9]", "")


def tokenize_normalized(col: Column | str) -> Column:
    """Tokenize then normalize each token and drop empties.

    This is the canonical analyzer for the search index (SURVEY.md §7.3) and
    the BM25 corpus of Q20: split on single spaces, lowercase, strip
    non-alphanumerics, remove empty tokens. Stays entirely in Catalyst via
    ``transform``/``filter`` higher-order functions.
    """
    toks = F.transform(tokenize_ws(col), normalize_token)
    return F.filter(toks, lambda t: t != F.lit(""))


def remove_stopwords(tokens: Column, stopwords=BASIC_STOPWORDS) -> Column:
    """array_except-based stopword removal (reference N4). Preserves order and
    duplicates of non-stopword tokens (unlike array_except, which dedups)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def clean_text(col: Column | str) -> Column:
    """Aggressive clean chain (Q06 / notebook cell 7 analog):
    lower -> strip non [a-z0-9 ] -> collapse spaces -> trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9 ]", "")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def clean_tweet_text(col: Column | str) -> Column:
    """Tweet-domain clean chain mirroring notebook cell 7 exactly:
    &amp;-entities -> 'and', em-dash -> space, URLs, @mentions, #hashtags
    stripped, whitespace collapsed."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "&amp;", "and")
    c = F.regexp_replace(c, "—", " ")
    c = F.regexp_replace(c, r"https?://\S+", "")
    c = F.regexp_replace(c, r"@\w+", "")
    c = F.regexp_replace(c, r"#\w+", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_apostrophes(col: Column | str) -> Column:
    """Unicode right-single-quote -> ASCII apostrophe (reference T5,
    ``Tweets_preprocessing.py:477``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[’]", "'")


def parse_twitter_timestamp(col: Column | str) -> Column:
    """Parse Twitter's ``EEE MMM dd HH:mm:ss +0000 yyyy`` format the way the
    reference does (T1-T3,T11 at ``Tweets_preprocessing.py:124-128``):
    strip weekday, strip tz offset, to_timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    no_weekday = F.ltrim(F.regexp_extract(c, r"(\ \w+.+)", 1))
    no_tz = F.regexp_replace(no_weekday, r"(\+\d+\ )", "")
    return F.to_timestamp(no_tz, "MMM dd HH:mm:ss yyyy")


def csv_safe(col: Column | str) -> Column:
    """Newline->'|', doublequote->singlequote scrub for CSV export parity
    (reference T6, ``Tweets_preprocessing.py:502-503``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, "\n", "|"), '"', "'")


def tokenize_url_aware(col: Column | str) -> Column:
    """URL/email-preserving tokenizer ~ Solr's UAX29URLEmailTokenizer
    (``SolrFieldType.java:34,43``): URLs and emails survive as single tokens;
    everything else splits on non-word chars."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"(https?://\S+|[\w.+-]+@[\w-]+\.[\w.-]+|\w+)"
    return F.regexp_extract_all(c, F.lit(pattern), 1)
