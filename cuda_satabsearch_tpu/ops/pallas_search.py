"""Search-layer driver for the Pallas SA kernel.

Mirrors ops/search.py's bucket orchestration but routes through the
hand-fused TPU kernel (ops/pallas_sa2.py).  Per chunk, RNG key
derivation, threefry uniform generation, and the kernel run as ONE
jitted computation — a single device dispatch per chunk per query
(dispatch and retrace overhead through the TPU tunnel otherwise dwarfs
the kernel itself: the kernel is ~30 us/entry, an eager vmap retrace is
~100 ms).  Bucket arrays are pre-sliced into padded chunks at upload
time, the analog of the reference's one-time pitched-copy layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import SAParams, DEFAULTS
from ..io.pack import PackedBucket, PackedQuery
from .common import (C_LANES, pack_tab, prepare_query, round8,
                     slots_per_restart)
from .engine import log_acc_slots
from .search import choose_chains

# Entries per pallas_call: the kernel compiles per (E, n1r, d2) triple;
# chunk-padding to a fixed E keeps that to one compile per bucket shape.
from .common import CHUNK_ENTRIES  # noqa: E402,F401 (shared quantum)


def chunk_layout(n: int, ndev: int = 1,
                 chunk_entries: int = CHUNK_ENTRIES,
                 d2: int | None = None):
    """[(start, end, padded_E)] — the exact chunk plan
    prepare_bucket_pallas2 builds for an n-entry bucket on an
    ndev-device mesh.  Exported so the load-balance harness
    (ops/balance.py) accounts for precisely the chunks that will run.

    With a mesh, every chunk pads to a multiple of MAX_GROUP * ndev so
    each device takes E/ndev rows of EVERY chunk.  On a single device,
    tails pad to the width's max_reachable_group (``d2``; MAX_GROUP
    when unknown) — never to a smaller power of two — so the effective
    group size, the group boundaries, and therefore the G-keyed pltpu
    RNG streams are IDENTICAL across mesh layouts: a device's local
    slice of a meshed chunk holds bitwise the same rows, groups, and
    group-leader seeds as the corresponding slice of the unsharded
    plan.  (A pow2 tail broke the sharded==unsharded guarantee in the
    default pltpu mode for sub-group tails, found round 5; padding to
    the full MAX_GROUP instead cost ~11%% on the 586-entry headline,
    so the quantum is the per-width group ceiling.)"""
    from .pallas_sa2 import max_reachable_group

    quantum = MAX_GROUP * ndev
    tailq = (quantum if ndev > 1
             else max_reachable_group(d2) if d2 is not None
             else MAX_GROUP)
    cs = min(-(-chunk_entries // quantum) * quantum,
             -(-max(n, 1) // quantum) * quantum)
    out = []
    for start in range(0, n, cs):
        end = min(start + cs, n)
        k = end - start
        E = -(-k // quantum) * quantum
        if ndev == 1 and k < quantum:
            E = -(-k // tailq) * tailq
        out.append((start, end, E))
    return out


MAX_GROUP = 16  # pallas_sa2.choose_group upper bound; chunk sizes must
# be multiples of it so any group size divides them


def _int_bytes(x, nbytes: int):
    """[..., N] int -> [..., N, nbytes] int8 (little-endian-style
    arithmetic split, endianness-free, exact).  Lets scores and maps
    leave the device in ONE packed int8 transfer: each D2H drain costs
    a full tunnel round trip (~25 ms), so two sequential drains double
    the warm per-query latency."""
    return jnp.stack([((x >> (8 * b)) & 255).astype(jnp.int8)
                      for b in range(nbytes)], axis=-1)


def _int_unbytes(p, dtype):
    """numpy [..., nbytes] int8 -> [...] dtype (sign from the top
    byte's arithmetic shift)."""
    nb = p.shape[-1]
    out = p[..., nb - 1].astype(dtype)
    for b in range(nb - 2, -1, -1):
        out = (out << 8) | (p[..., b].astype(dtype) & 0xFF)
    return out


def _pack_out(scores, maps):
    """(int scores [..., N], int maps [..., N, n1r] or None) -> ONE
    int8 array [..., N, W]; layout: the score byte(s) then the map
    bytes (multi-byte planes arithmetic-split low byte first)."""
    sb = scores.dtype.itemsize
    parts = [scores[..., None] if sb == 1 else _int_bytes(scores, sb)]
    if maps is not None:
        mb = maps.dtype.itemsize
        parts.append(maps if mb == 1 else _int_bytes(maps, mb).reshape(
            maps.shape[:-1] + (mb * maps.shape[-1],)))
    return jnp.concatenate(parts, axis=-1)


def _unpack_out(packed, n1r, lsoln, map_bytes, score_bytes):
    """Host-side inverse of _pack_out on the drained numpy array."""
    scores = (packed[..., 0].astype(np.int32) if score_bytes == 1
              else _int_unbytes(packed[..., :score_bytes], np.int32))
    if not lsoln:
        return scores, None
    mb = packed[..., score_bytes:]
    if map_bytes > 1:
        maps = _int_unbytes(
            mb.reshape(mb.shape[:-1] + (n1r, map_bytes)), np.int32)
    else:
        maps = mb.astype(np.int32)
    return scores, maps


def _score_dtype(n1r: int):
    """Narrowest score dtype: |score| <= n1*(n1-1) <= n1r*(n1r-1)."""
    m = n1r * (n1r - 1)
    return (jnp.int8 if m <= 127
            else jnp.int16 if m <= 32767 else jnp.int32)


def _map_dtype(chunk_shapes):
    """Narrowest map dtype: values in [-1, d2-1]."""
    return (jnp.int8 if max(d for _e, d in chunk_shapes) <= 128
            else jnp.int16)


def prepare_bucket_pallas2(bucket: PackedBucket, device=None,
                           chunk_entries: int = CHUNK_ENTRIES,
                           mesh=None) -> dict:
    """v2-layout bucket arrays pre-sliced into padded chunks: tables
    stacked flat as [E*d2, d2] so a grid block (G*d2, d2) covers a
    whole entry group.  Every chunk is padded to a multiple of
    MAX_GROUP (padding rows replicate entry 0 and are dropped at
    assembly).

    With ``mesh`` (a 1-D jax.sharding.Mesh), chunks are padded to a
    multiple of MAX_GROUP * mesh.size and every entry-axis array is
    placed sharded across the mesh (the analog of the reference's
    one-time DB copy, but SPMD: each chip holds 1/n of the entries)."""
    n = bucket.size
    d2 = bucket.dim
    ndev = mesh.size if mesh is not None else 1
    quantum = MAX_GROUP * ndev
    cs = min(-(-chunk_entries // quantum) * quantum,
             -(-max(n, 1) // quantum) * quantum)
    layout = chunk_layout(n, ndev, chunk_entries, d2=d2)
    tab2p_full = pack_tab(bucket.tabhi, bucket.tablo)
    types_full = bucket.types.astype(np.int32)
    dmat_full = bucket.dmat.astype(np.float32)
    orders_full = bucket.orders.astype(np.int32)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = mesh.axis_names[0]
        s1 = NamedSharding(mesh, P(ax))
        s2 = NamedSharding(mesh, P(ax, None))

        def put1(x):  # entry axis leading, 1-D
            return jax.device_put(jnp.asarray(x), s1)

        def put2(x):  # entry-major rows, 2-D
            return jax.device_put(jnp.asarray(x), s2)
    else:
        def put1(x):
            x = jnp.asarray(x)
            return jax.device_put(x, device) if device is not None else x

        put2 = put1

    chunks = []
    for start, end, E in layout:
        k = end - start
        idx = np.concatenate([np.arange(start, end),
                              np.zeros(E - k, np.int64)])
        chunks.append({
            "start": start, "end": end, "size": E,
            "indices": put1(bucket.index[idx].astype(np.uint32)),
            "n2": put1(orders_full[idx]),
            "types2": put2(types_full[idx].reshape(E * d2, 1)),
            "tab2p": put2(tab2p_full[idx].reshape(E * d2, d2)),
            "dmat2": put2(dmat_full[idx].reshape(E * d2, d2)),
        })
    return {"chunks": chunks, "cs": cs, "v": 2, "mesh": mesh}


@functools.lru_cache(maxsize=None)
def _make_db_fn2(chunk_shapes: tuple, n1r: int, c_par: int, r_seq: int,
                 lorder: bool, params: SAParams, interpret: bool,
                 rng_mode: str, lsoln: bool = True, mesh=None):
    """v2 single-dispatch whole-DB search, keyed by ``n1r = round8(n1)``
    — ONE compiled program serves every query order in the same
    8-padded bucket (the exact order rides in as a traced scalar).

    With ``mesh`` (1-D jax.sharding.Mesh over the entry axis), every
    chunk's kernel runs SPMD via shard_map: each device executes the
    SAME Pallas kernel on its local 1/n slice of the entries (chunks
    are pre-padded to a multiple of MAX_GROUP * mesh.size).  Per-entry
    RNG is keyed by global file-order indices, so sharded and unsharded
    runs are bitwise identical.  No collectives in the hot loop — the
    score gather happens at drain time.
    """
    from .pallas_sa2 import (make_pallas2_bucket_search, make_qb2,
                             make_qflat)

    assert n1r == round8(n1r), n1r
    P = slots_per_restart(n1r, params.maxiter)
    ndev = mesh.size if mesh is not None else 1
    kerns = {}
    for E, d2 in set(chunk_shapes):
        assert E % ndev == 0, (E, ndev)
        if ndev > 1:
            # the local-slice build must land on the SAME entry-group
            # size as an unsharded build: G seeds the group-leader
            # pltpu RNG streams, so a silent G fallback (E/ndev not a
            # multiple of the tuned G) would break the bitwise
            # sharded==unsharded guarantee without any error
            from .pallas_sa2 import effective_group
            gl, gu = (effective_group(E // ndev, d2, n1r),
                      effective_group(E, d2, n1r))
            assert gl == gu, (
                f"chunk E={E} over {ndev} devices picks group {gl} "
                f"locally vs {gu} unsharded; pad chunks so E/ndev is a "
                f"multiple of the tuned group (prepare with mesh=)")
        kerns[(E, d2)] = make_pallas2_bucket_search(
            E // ndev, n1r, d2, c_par, r_seq, lorder, params, interpret,
            rng_mode, lsoln)

    def _uniforms(indices, seed, tag, E, G):
        from .engine import log_acc_slots

        base = jax.random.fold_in(jax.random.PRNGKey(seed), tag)
        keys = jax.vmap(
            lambda i: jax.random.fold_in(base, i))(indices)

        def per_entry(key):
            def per_restart(r):
                u = jax.random.uniform(
                    jax.random.fold_in(key, r), (P, c_par),
                    dtype=jnp.float32)
                u = log_acc_slots(u, n1r)  # accept slots -> ln(u)
                if c_par < C_LANES:
                    u = jnp.pad(u, ((0, 0), (0, C_LANES - c_par)))
                return u
            return jax.vmap(per_restart)(
                jnp.arange(r_seq, dtype=jnp.uint32))

        u4 = jax.vmap(per_entry)(keys)  # [E, r, P, C]
        return (u4.reshape(E // G, G, r_seq, P, C_LANES)
                .transpose(0, 2, 3, 1, 4)
                .reshape(E // G, r_seq, P * G, C_LANES))

    def _sharded_call(kern, G, E, d2, indices, n2, types2, tab2p, dmat2,
                      seed, tag, n1s, qt, qb2t, qb2d):
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as SP

        ax = mesh.axis_names[0]
        ent = SP(ax)
        ent2 = SP(ax, None)
        rep = SP()

        def body(idx_l, n2_l, t2_l, tp_l, dm_l, seed_a, tag_a, n1s_a,
                 qt_a, qb2t_a, qb2d_a):
            if rng_mode == "pltpu":
                rng_in = jnp.concatenate([
                    seed_a.astype(jnp.int32)[None],
                    tag_a.astype(jnp.int32)[None],
                    idx_l.astype(jnp.int32)])
            else:
                rng_in = _uniforms(idx_l, seed_a, tag_a, E // ndev, G)
            res = kern(n2_l, qt_a, qb2t_a, qb2d_a, t2_l, tp_l,
                       dm_l, rng_in, n1s_a)
            return res if lsoln else res[0]

        out_specs = (SP(ax, None, None),)
        if lsoln:
            out_specs += (SP(ax, None, None),)
        return shard_map(
            body, mesh=mesh,
            in_specs=(ent, ent, ent2, ent2, ent2, rep, rep, rep, rep,
                      rep, rep),
            out_specs=out_specs if lsoln else out_specs[0],
            check_rep=False,
        )(indices, n2, types2, tab2p, dmat2,
          jnp.asarray(seed, jnp.int32), jnp.asarray(tag, jnp.int32),
          n1s, qt, qb2t, qb2d)

    def f(seed, tag, n1q, qt, qtabp, qdmat, chunk_args):
        n1s = jnp.asarray(n1q, jnp.int32).reshape(1)
        outs = []
        qb2s = {}
        for (E, d2), (indices, n2, types2, tab2p, dmat2) in zip(
                chunk_shapes, chunk_args):
            kern, G = kerns[(E, d2)]
            qkey = (kern.qrep, G)
            if qkey not in qb2s:
                qb2s[qkey] = (make_qflat(qtabp, qdmat)
                              if kern.qrep == "qflat"
                              else make_qb2(qtabp, qdmat, G))
            qb2t, qb2d = qb2s[qkey]
            if mesh is not None:
                out = _sharded_call(kern, G, E, d2, indices, n2, types2,
                                    tab2p, dmat2, seed, tag, n1s, qt,
                                    qb2t, qb2d)
                outs.append((out if lsoln else (out, None), G))
                continue
            if rng_mode == "pltpu":
                rng_in = jnp.concatenate([
                    jnp.asarray(seed, jnp.int32)[None],
                    jnp.asarray(tag, jnp.int32)[None],
                    indices.astype(jnp.int32)])
            else:
                rng_in = _uniforms(indices, seed, tag, E, G)
            outs.append((kern(n2, qt, qb2t, qb2d, types2, tab2p,
                              dmat2, rng_in, n1s), G))
        # concatenate on device: the drain must be ONE transfer per
        # output, not one per chunk (each D2H costs a full round trip
        # through remote-TPU tunnels).  Narrow dtypes halve/quarter the
        # transfer (~15 MB/s through the tunnel); both dtypes are
        # DERIVED from the configured dims (SessionConfig.maxdim is
        # configurable — a hard-coded cast would silently wrap).
        scores_flat = jnp.concatenate(
            [S[:, :, 0].reshape(-1) for (S, _M), _G in outs]).astype(
                _score_dtype(n1r))
        if not lsoln:
            return scores_flat
        maps_flat = jnp.concatenate(
            [M[:, :, 0].reshape(-1, n1r) for (_S, M), _G in outs]).astype(
                _map_dtype(chunk_shapes))
        # ONE packed int8 output: scores + maps drain in a single D2H
        return _pack_out(scores_flat, maps_flat)

    from ..core.aotcache import AotJit
    return AotJit(f, ("db_fn2", chunk_shapes, n1r, c_par, r_seq, lorder,
                      params, rng_mode, lsoln),
                  enabled=mesh is None and not interpret)


@functools.lru_cache(maxsize=None)
def _make_db_fnK(chunk_shapes: tuple, n1r: int, K: int, c_par: int,
                 r_seq: int, lorder: bool, params: SAParams,
                 interpret: bool, rng_mode: str, lsoln: bool = False,
                 mesh=None):
    """K-query batched whole-DB search: the kernel's query grid axis
    runs all K queries in ONE pallas_call per chunk (total pallas_calls
    = #chunks, vs K x #chunks under the scan path), so the per-call
    fixed cost — launch, VMEM setup, the glue ops around each call —
    is paid once per chunk.  Keyed by n1r = round8(n1): the K queries
    may have ANY mix of exact orders within the bucket (per-query
    orders ride in the traced ``n1s`` array).  Output: [K, total]
    scores + [K, total, n1r] maps; RNG streams are identical to
    per-query dispatch (keyed by per-query tags).

    With ``mesh`` (1-D jax.sharding.Mesh over the entry axis) each
    chunk's batched kernel runs SPMD via shard_map on its local 1/n
    entry slice — the fastest kernel configuration (query grid axis)
    and multi-chip execution are the SAME code path.  Per-entry RNG is
    keyed by global file-order indices, so sharded == unsharded
    bitwise."""
    from .pallas_sa2 import (make_pallas2_bucket_search, make_qb2_batched,
                             make_qflat_batched)

    assert n1r == round8(n1r), n1r
    P = slots_per_restart(n1r, params.maxiter)
    ndev = mesh.size if mesh is not None else 1
    kerns = {}
    for E, d2 in set(chunk_shapes):
        assert E % ndev == 0, (E, ndev)
        if ndev > 1:
            # same guard as _make_db_fn2: a G fallback difference
            # between the local-slice and unsharded builds would change
            # the group-leader RNG streams silently
            from .pallas_sa2 import effective_group
            gl, gu = (effective_group(E // ndev, d2, n1r),
                      effective_group(E, d2, n1r))
            assert gl == gu, (
                f"chunk E={E} over {ndev} devices picks group {gl} "
                f"locally vs {gu} unsharded; pad chunks so E/ndev is a "
                f"multiple of the tuned group (prepare with mesh=)")
        kerns[(E, d2)] = make_pallas2_bucket_search(
            E // ndev, n1r, d2, c_par, r_seq, lorder, params, interpret,
            rng_mode, lsoln, nq=K, batched_api=True)

    def _uniformsK(indices, seed, tags, E, G):
        def per_tag(tag):
            keys = jax.vmap(lambda i: jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(seed), tag),
                i))(indices)

            def per_entry(key):
                def per_restart(r):
                    u = jax.random.uniform(
                        jax.random.fold_in(key, r), (P, c_par),
                        dtype=jnp.float32)
                    u = log_acc_slots(u, n1r)
                    if c_par < C_LANES:
                        u = jnp.pad(
                            u, ((0, 0), (0, C_LANES - c_par)))
                    return u
                return jax.vmap(per_restart)(
                    jnp.arange(r_seq, dtype=jnp.uint32))

            u4 = jax.vmap(per_entry)(keys)  # [E, r, P, C]
            return (u4.reshape(E // G, G, r_seq, P, C_LANES)
                    .transpose(0, 2, 3, 1, 4)
                    .reshape(E // G, r_seq, P * G, C_LANES))

        return jax.vmap(per_tag)(tags)  # [K, EG, r, PG, C]

    def _callK(kern, G, E, indices, n2, types2, tab2p, dmat2, seed,
               tags, n1s, qts, qb2t, qb2d):
        if rng_mode == "pltpu":
            rng_in = jnp.concatenate([
                jnp.asarray(seed, jnp.int32)[None],
                jnp.zeros((1,), jnp.int32),  # tag slot unused
                indices.astype(jnp.int32)])
        else:
            rng_in = _uniformsK(indices, seed, tags, E, G)
        return kern(n2, qts.astype(jnp.int32), qb2t, qb2d,
                    types2, tab2p, dmat2, rng_in, tags, n1s)

    def _shardedK(kern, G, E, indices, n2, types2, tab2p, dmat2, seed,
                  tags, n1s, qts, qb2t, qb2d):
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as SP

        ax = mesh.axis_names[0]
        ent = SP(ax)
        ent2 = SP(ax, None)
        rep = SP()

        def body(idx_l, n2_l, t2_l, tp_l, dm_l, seed_a, tags_a, n1s_a,
                 qts_a, qb2t_a, qb2d_a):
            out = _callK(kern, G, E // ndev, idx_l, n2_l, t2_l, tp_l,
                         dm_l, seed_a, tags_a, n1s_a, qts_a,
                         qb2t_a, qb2d_a)
            return out if lsoln else out[0]

        out_specs = (SP(None, ax, None, None),)
        if lsoln:
            out_specs += (SP(None, ax, None, None),)
        out = shard_map(
            body, mesh=mesh,
            in_specs=(ent, ent, ent2, ent2, ent2, rep, rep, rep, rep,
                      rep, rep),
            out_specs=out_specs if lsoln else out_specs[0],
            check_rep=False,
        )(indices, n2, types2, tab2p, dmat2,
          jnp.asarray(seed, jnp.int32), tags, n1s, qts, qb2t,
          qb2d)
        return out if lsoln else (out, None)

    def f(seed, tags, n1s, qts, qtabps, qdmats, chunk_args):
        qb2s = {}
        out_s = []
        out_m = []
        for (E, d2), (indices, n2, types2, tab2p, dmat2) in zip(
                chunk_shapes, chunk_args):
            kern, G = kerns[(E, d2)]
            qkey = (kern.qrep, G)
            if qkey not in qb2s:
                qb2s[qkey] = (make_qflat_batched(qtabps, qdmats)
                              if kern.qrep == "qflat"
                              else make_qb2_batched(qtabps, qdmats, G))
            qb2t, qb2d = qb2s[qkey]
            call = _callK if mesh is None else _shardedK
            S, M = call(kern, G, E, indices, n2, types2, tab2p, dmat2,
                        seed, tags, n1s, qts, qb2t, qb2d)
            out_s.append(S[..., 0].reshape(K, -1))  # [K, E]
            if lsoln:
                out_m.append(M[..., 0].reshape(K, -1, n1r))
        # narrow drains: see _make_db_fn2; both dtypes derived from
        # the configured dims (never assumption-cast)
        scores = jnp.concatenate(out_s, axis=1).astype(_score_dtype(n1r))
        if not lsoln:
            return scores
        return _pack_out(scores, jnp.concatenate(out_m, axis=1).astype(
            _map_dtype(chunk_shapes)))

    from ..core.aotcache import AotJit
    return AotJit(f, ("db_fnK", chunk_shapes, n1r, K, c_par, r_seq,
                      lorder, params, rng_mode, lsoln),
                  enabled=mesh is None and not interpret)


K_TILE = 64  # max queries per device program


def _tile_plan(K: int) -> list[int]:
    """Split K queries into power-of-two scan tiles (32/16/8/4/2/1).

    A fixed tile would pad 1-query batches to full-DB multiples;
    power-of-two tiles bound padding waste to < 2x while keeping the
    number of distinct compiled programs at most 6 (one per tile size).
    Large tiles matter on remote-tunnel TPUs: each dispatch costs a
    ~25 ms round trip, so a 32-query stream in ONE program runs at
    device speed while 4 x 8-query dispatches pay 4 round trips.
    """
    plan = []
    rem = K
    while rem >= K_TILE:
        plan.append(K_TILE)
        rem -= K_TILE
    t = K_TILE >> 1
    while rem > 0:
        if rem >= t or t == 1:
            plan.append(t)
            rem -= min(rem, t)
        else:
            t >>= 1
    return plan


def _log_tile_waste(K: int, tiles: list[int]) -> int:
    """Padded-slot accounting for a tile plan (no silent caps: padded
    slots would re-run the last query under throwaway tags and burn
    real device iterations).  The power-of-two descent in _tile_plan
    always sums exactly to K (tiles can shrink to 1), so pad is 0 in
    practice — this logs loudly if a future plan ever over-allocates."""
    import sys as _sys

    pad = sum(tiles) - K
    if pad:
        print(f"# pallas multiquery: {K} queries -> tiles {tiles}, "
              f"{pad} padded slot{'s' if pad != 1 else ''} "
              f"({100.0 * pad / (K + pad):.1f}% of the batch wasted)",
              file=_sys.stderr)
    return pad


@functools.lru_cache(maxsize=None)
def _concat_k(ntiles: int):
    def f(*parts):  # packed (or score-only) per-tile arrays
        return jnp.concatenate(parts, axis=0)
    return jax.jit(f)


def dispatch_db_pallas2_multi(queries, db, *, maxstart: int, lorder: bool,
                              seed: int, query_tags, c_max: int = C_LANES,
                              params: SAParams = DEFAULTS,
                              device_db: dict | None = None,
                              interpret: bool = False,
                              rng_mode: str = "pltpu",
                              lsoln: bool = False, mesh=None):
    """Dispatch K queries of the same round8(order) bucket — any MIX of
    exact orders — as a pipeline of power-of-two scan tiles (up to
    K_TILE queries per device program; the tile plan covers K exactly,
    no padded query slots — _log_tile_waste guards that invariant
    loudly).  Tile outputs are concatenated on device; the handle
    drains with assemble_db_pallas2_multi in a single D2H transfer.
    Under the n1r RNG slot schedule each query's stream is identical to
    what per-query dispatch would use, so batched == sequential
    bitwise."""
    n1r = round8(queries[0].order)
    assert all(round8(q.order) == n1r for q in queries)
    c_par, r_seq = choose_chains(maxstart, min(c_max, C_LANES))

    K = len(queries)
    tags = list(query_tags)
    assert len(tags) == K
    tiles = _tile_plan(K)
    assert _log_tile_waste(K, tiles) == 0, (K, tiles)
    queries = list(queries)
    n1s = [q.order for q in queries]

    qts, qtabps, qdmats = [], [], []
    for q in queries:
        qtypes, _qtv, qtabp, qdmat = prepare_query(q, n1r)
        qts.append(qtypes)
        qtabps.append(qtabp)
        qdmats.append(qdmat)

    shapes = []
    chunk_args = []
    chunk_meta = []
    for bi, bucket in enumerate(db.buckets):
        darr = None
        if device_db is not None:
            darr = device_db.get(bi, {}).get("pallas")
        if darr is None or darr.get("v") != 2 or darr.get("mesh") is not mesh:
            darr = prepare_bucket_pallas2(bucket, mesh=mesh)
        for ch in darr["chunks"]:
            shapes.append((ch["size"], bucket.dim))
            chunk_args.append((ch["indices"], ch["n2"], ch["types2"],
                               ch["tab2p"], ch["dmat2"]))
            chunk_meta.append(((bucket, ch["start"], ch["end"]),
                               ch["size"]))

    qts = np.stack(qts)
    qtabps = np.stack(qtabps)
    qdmats = np.stack(qdmats)
    parts = []
    t0 = 0
    for tile in tiles:  # jit specializes once per distinct tile length
        sl = slice(t0, t0 + tile)
        t0 += tile
        # query grid axis: all `tile` queries in one pallas_call per
        # chunk — with or without a mesh (the sharded variant runs the
        # SAME batched kernel SPMD on each device's entry slice)
        fn = _make_db_fnK(tuple(shapes), n1r, tile, c_par, r_seq,
                          lorder, params, interpret, rng_mode, lsoln,
                          mesh)
        parts.append(fn(seed, jnp.asarray(tags[sl], jnp.int32),
                        jnp.asarray(n1s[sl], jnp.int32),
                        jnp.asarray(qts[sl]), jnp.asarray(qtabps[sl]),
                        jnp.asarray(qdmats[sl]), chunk_args))
    outs = parts[0] if len(parts) == 1 else _concat_k(len(parts))(*parts)
    mbytes = jnp.dtype(_map_dtype(shapes)).itemsize
    sbytes = jnp.dtype(_score_dtype(n1r)).itemsize
    return (db, n1s[:K], n1r, chunk_meta, outs, K, lsoln, mbytes, sbytes)


def assemble_db_pallas2_multi(handle) -> list[tuple[np.ndarray, np.ndarray]]:
    """Drain a multi-query handle: ONE D2H for the whole batch (scores
    and maps ride one packed int8 array — each drain costs a tunnel
    round trip), then ONE vectorized scatter per chunk across the whole
    query axis (a per-query scatter loop costs ~65 ms at 256 queries —
    4% of the batch — in small numpy ops)."""
    from ..parallel.distributed import to_host

    db, n1s, n1r, chunk_meta, outs, K, lsoln, mbytes, sbytes = handle
    if lsoln:
        sf_k, mf_k = _unpack_out(to_host(outs), n1r, True, mbytes,
                                 sbytes)
    else:
        sf_k, mf_k = to_host(outs), None
    scores_all = np.zeros((K, db.nentries), np.int32)
    maps_all = None
    if mf_k is not None:
        maps_all = np.full((K, db.nentries, n1r), -1, np.int32)
    off = 0
    for (bucket, start, end), size in chunk_meta:
        k = end - start
        sub_idx = bucket.index[start:end]
        valid = sub_idx >= 0
        scores_all[:, sub_idx[valid]] = sf_k[:, off:off + k][:, valid]
        if mf_k is not None:
            maps_all[:, sub_idx[valid]] = mf_k[:, off:off + k][:, valid]
        off += size
    return [(scores_all[qi],
             None if maps_all is None else maps_all[qi, :, :n1s[qi]])
            for qi in range(K)]


def dispatch_db_pallas2(query: PackedQuery, db, *, maxstart: int,
                        lorder: bool, seed: int, query_tag: int,
                        c_max: int = C_LANES,
                        params: SAParams = DEFAULTS,
                        device_db: dict | None = None,
                        interpret: bool = False,
                        rng_mode: str = "pltpu",
                        lsoln: bool = True, mesh=None):
    """v2 twin of dispatch_db_pallas.  ``mesh``: optional 1-D device
    mesh; the kernel then runs SPMD over the entry axis (shard_map)."""
    n1 = query.order
    n1r = round8(n1)
    c_par, r_seq = choose_chains(maxstart, min(c_max, C_LANES))
    qtypes, _qtypesv, qtabp, qdmat = prepare_query(query, n1r)

    shapes = []
    chunk_args = []
    chunk_meta = []
    for bi, bucket in enumerate(db.buckets):
        darr = None
        if device_db is not None:
            darr = device_db.get(bi, {}).get("pallas")
        if darr is None or darr.get("v") != 2 or darr.get("mesh") is not mesh:
            darr = prepare_bucket_pallas2(bucket, mesh=mesh)
        for ch in darr["chunks"]:
            shapes.append((ch["size"], bucket.dim))
            chunk_args.append((ch["indices"], ch["n2"], ch["types2"],
                               ch["tab2p"], ch["dmat2"]))
            chunk_meta.append(((bucket, ch["start"], ch["end"]),
                               ch["size"]))

    fn = _make_db_fn2(tuple(shapes), n1r, c_par, r_seq, lorder, params,
                      interpret, rng_mode, lsoln, mesh)
    outs = fn(seed, query_tag, n1, jnp.asarray(qtypes),
              jnp.asarray(qtabp), jnp.asarray(qdmat), chunk_args)
    mbytes = jnp.dtype(_map_dtype(shapes)).itemsize
    sbytes = jnp.dtype(_score_dtype(n1r)).itemsize
    return (db, n1, n1r, chunk_meta, outs, lsoln, mbytes, sbytes)


def assemble_db_pallas2(handle) -> tuple[np.ndarray, np.ndarray]:
    """Drain a single-query handle: scores and maps arrive in ONE
    packed int8 transfer (each D2H costs a tunnel round trip)."""
    from ..parallel.distributed import to_host

    db, n1, n1r, chunk_meta, outs, lsoln, mbytes, sbytes = handle
    if lsoln:
        sf, mf = _unpack_out(to_host(outs), n1r, True, mbytes, sbytes)
    else:
        sf, mf = to_host(outs), None
    scores = np.zeros((db.nentries,), np.int32)
    maps = np.full((db.nentries, n1), -1, np.int32)
    off = 0
    for (bucket, start, end), size in chunk_meta:
        k = end - start
        sub_idx = bucket.index[start:end]
        valid = sub_idx >= 0
        scores[sub_idx[valid]] = sf[off:off + k][valid]
        if mf is not None:
            maps[sub_idx[valid]] = mf[off:off + k, :n1][valid]
        off += size
    return scores, maps
