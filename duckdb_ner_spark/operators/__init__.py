# Import order registers declared queries (module import side effect).
from . import (  # noqa: F401
    cleaning,
    components,
    curation,
    dedup,
    multimodal,
    ner_queries,
    relational,
    relational_ext,
    retrieval,
    round7,
    round7c,
    round7d,
    sampling,
    scalepatterns,
    layout_queries,
    similarity,
    sources_queries,
    streaming_queries,
    textstats,
    trainprep,
)
from ..functions import grouped  # noqa: F401,E402  (declared grouped-API queries)
