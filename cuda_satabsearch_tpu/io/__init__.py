from .parser import (  # noqa: F401
    TableauEntry,
    parse_entry,
    read_database,
    read_queries,
    parse_search_input,
)
from .writer import format_entry  # noqa: F401
from .pack import PackedDB, PackedQuery, pack_database, pack_query  # noqa: F401
