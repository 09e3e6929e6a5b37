from . import (  # noqa: F401
    dedup,
    graph,
    joins,
    multimodal,
    pipeline,
    sampling,
    similarity,
    sketches,
    textstats,
    topk,
)
