from .query_engine import QueryEngine, topk_merge  # noqa: F401
