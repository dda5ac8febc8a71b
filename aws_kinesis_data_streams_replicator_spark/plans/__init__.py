from .queries import QUERIES, ORACLE_SQL, flagship  # noqa: F401
