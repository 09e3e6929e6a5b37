from . import (  # noqa: F401
    dedup,
    joins,
    multimodal,
    pipeline,
    sampling,
    similarity,
    sketches,
    textstats,
    topk,
)
