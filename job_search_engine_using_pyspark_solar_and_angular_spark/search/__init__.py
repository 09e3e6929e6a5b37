from .index import SearchIndex, build_index  # noqa: F401
from .bm25 import bm25_score_terms, bm25_search  # noqa: F401
from .api import search_hashtag, search_keyword, search_user  # noqa: F401
