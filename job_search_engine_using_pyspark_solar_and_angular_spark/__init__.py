"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference job-search engine (see SURVEY.md).

Everything here is idiomatic Spark DataFrame/SQL: declarative plans handed to
Catalyst, broadcast hints on dimension tables, window-function dedup instead of
sort+dropDuplicates, and zero driver-side collect loops in any operator path.

Subpackages
-----------
functions   column-level building blocks (tokenizers, cleaning, hashing, vectors)
operators   reusable DataFrame -> DataFrame operators (dedup, top-k, similarity,
            text stats, multimodal plumbing)
search      the inverted-index + BM25 subsystem (SURVEY.md §7.3)
pipeline    the tweet-shaped preprocess pipeline rewritten as one lazy plan
streaming   Structured Streaming front door (windowed trending, streaming dedup)
queries     the declared correctness query set (SURVEY.md §2.12) + extensions
"""

__version__ = "0.1.0"
