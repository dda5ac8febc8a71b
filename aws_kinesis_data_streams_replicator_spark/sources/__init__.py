from .tables import TABLES, load_table, load_tables, register_views  # noqa: F401
from .envelope import envelope_from_events, ENVELOPE_SCHEMA  # noqa: F401
