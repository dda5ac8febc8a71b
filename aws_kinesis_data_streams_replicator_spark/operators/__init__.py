from . import replication, dedup, similarity, text, windows, multimodal  # noqa: F401
