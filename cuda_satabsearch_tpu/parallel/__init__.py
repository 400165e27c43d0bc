from .mesh import ENTRY_AXIS, entry_sharding, gather_scores, make_mesh, replicated  # noqa: F401
