"""Search-layer driver for the Pallas SA kernel.

Mirrors ops/search.py's bucket orchestration but routes through the
hand-fused TPU kernel (ops/pallas_sa.py).  Selected by
``backend="pallas"`` in the high-level API; the XLA engine remains the
fallback (CPU golden-adjacent path and mesh-sharded execution).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import SAParams, DEFAULTS
from ..io.pack import PackedBucket, PackedQuery
from .pallas_sa import (C_LANES, make_pallas_bucket_search, make_uniforms,
                        pack_tab, prepare_query, round8)
from .search import choose_chains, entry_keys

# Entries per pallas_call: the kernel compiles per (E, n1, d2) triple;
# chunk-padding to a fixed E keeps that to one compile per bucket shape.
CHUNK_ENTRIES = 128


def prepare_bucket_pallas(bucket: PackedBucket, device=None) -> dict:
    """Precompute (and optionally upload) kernel-format bucket arrays."""
    E, d2 = bucket.size, bucket.dim
    tab2p = pack_tab(bucket.tabhi, bucket.tablo)
    arrs = {
        "n2": bucket.orders.astype(np.int32),
        "types2": bucket.types.astype(np.int32)[:, :, None],
        "tab2p": tab2p,
        "dmat2": bucket.dmat.astype(np.float32),
    }
    if device is not None:
        arrs = {k: jax.device_put(jnp.asarray(v), device)
                for k, v in arrs.items()}
    else:
        arrs = {k: jnp.asarray(v) for k, v in arrs.items()}
    return arrs


def search_bucket_pallas(query: PackedQuery, bucket: PackedBucket, *,
                         maxstart: int, lorder: bool, seed: int,
                         query_tag: int, c_max: int = C_LANES,
                         params: SAParams = DEFAULTS,
                         device_arrays: dict | None = None,
                         interpret: bool = False
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Search one packed bucket with the Pallas kernel.

    Returns (scores [N], bestmaps [N, n1]) like search_bucket.
    """
    n1, d2 = query.order, bucket.dim
    n1r = round8(n1)
    c_par, r_seq = choose_chains(maxstart, min(c_max, C_LANES))
    P = n1 + 3 * params.maxiter

    qtypes, qtypesv, qtabp, qdmat = prepare_query(query, n1r)
    qargs = (jnp.asarray(qtypes), jnp.asarray(qtypesv),
             jnp.asarray(qtabp), jnp.asarray(qdmat))
    darr = device_arrays or prepare_bucket_pallas(bucket)
    keys = entry_keys(seed, query_tag, bucket.index)

    n = bucket.size
    cs = min(CHUNK_ENTRIES, max(n, 1))
    scores = np.empty((n,), np.int32)
    maps = np.empty((n, n1), np.int32)
    fn = make_pallas_bucket_search(cs, n1, d2, c_par, r_seq, lorder,
                                   params, interpret)
    for start in range(0, n, cs):
        end = min(start + cs, n)
        if end - start < cs and n > cs:
            idx = np.concatenate([np.arange(start, end),
                                  np.zeros(cs - (end - start), np.int64)])
        else:
            idx = np.arange(start, start + cs) if end - start == cs \
                else np.arange(start, end)
        if len(idx) < cs:  # whole bucket smaller than one chunk
            fn = make_pallas_bucket_search(len(idx), n1, d2, c_par, r_seq,
                                           lorder, params, interpret)
        uniforms = make_uniforms(keys[idx], r_seq, P, c_par)
        s, m = fn(darr["n2"][idx], *qargs, darr["types2"][idx],
                  darr["tab2p"][idx], darr["dmat2"][idx], uniforms)
        k = end - start
        scores[start:end] = np.asarray(s)[:k, 0, 0]
        maps[start:end] = np.asarray(m)[:k, :n1, 0]
    return scores, maps
