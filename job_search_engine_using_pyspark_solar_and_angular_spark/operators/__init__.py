from . import dedup, multimodal, similarity, textstats, topk  # noqa: F401
