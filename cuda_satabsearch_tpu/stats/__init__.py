from .gumbel import norm2, z_gumbel, pv_gumbel, score_stats  # noqa: F401
