# Import order registers declared queries (module import side effect).
from . import dedup, multimodal, ner_queries, relational, similarity, textstats  # noqa: F401
