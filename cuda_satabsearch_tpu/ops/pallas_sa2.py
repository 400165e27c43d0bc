"""Pallas TPU kernel v2: entry-group sublane batching, db-domain delta.

Same semantics as ops/pallas_sa.py (the v1 kernel, kept for reference
and cross-checking) but processes G database entries per grid step,
packing their SSE dimensions side by side in the sublane axis, and —
unlike v1 — evaluates the move delta in the *db-SSE domain*:

* v1/v2r1 gathered per-query-SSE rows with an O(n1) loop of masked
  segment reductions (~10 vector ops per query SSE per iteration);
* here the only per-lane-index gathers are (a) three block-diagonal
  one-hot MXU contractions fetching column oldj/newj of each entry's
  tableau + distance matrix (the tableau pair rides ONE dot via a
  64*oh_old + oh_new packed one-hot), and (b) one k-major contraction
  fetching the query row/column at ssei, scattered to db rows by a
  cheap revmap == k select loop (3 ops per query SSE).

The delta itself is then a single masked pass over [G*d2, C]:
for every db SSE l currently matched to query SSE k = revmap[l],
score the pair (ssei, k) against (j, l) for j = oldj/newj exactly as
the reference's deltasd does per thread (cudaSaTabsearch_kernel.cu
:502-535), and segment-reduce.  The initial full score (tmscord,
kernel.cu:396-440) reuses the same machinery per query SSE and halves
the double-counted pair sum (exact: tableau scores are small ints).

Layout contracts:
* db-side flat index p = g*d2 + l (g = entry-in-group, l = db SSE);
* query-side flat index p = g*n1r + k;
* per-(entry, chain) scalars live as [G, C] tiles; broadcast into a
  segment via reshape-broadcast; segment reductions via [G, seg, C]
  reshape + axis-1 reduce;
* uniforms (supplied mode) are slot-major: row s*G + g = slot s of
  entry g, so a slot read is one contiguous [G, C] (or [3G, C]) slice;
* block-diagonal db tables are built once per grid step into VMEM
  scratch; the query matrices arrive pre-scattered k-major as qb2
  (rows k*G + g over cols (g, i); tableau stacked above distances).

The uniform streams per (entry, restart) are identical to v1/engine/
golden in "supplied" mode (bitwise-testable); "pltpu" mode uses the
hardware PRNG with a per-(entry, restart) seed mix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import SAParams, DEFAULTS
from .common import C_LANES, round8

I32 = jnp.int32
F32 = jnp.float32
BF16 = jnp.bfloat16  # MXU-native; exact for one-hots and codes <= 256


# Measured on the real chip (586-entry benchmark, 8-SSE query,
# scripts/sweep2.py — drain-based timing, scan-amortized dispatch):
# best (group, fetch, cum) per bucket width.  Group is a preference;
# the factory falls back to the largest power-of-two divisor of E at
# or below it.
TUNED_CONFIG = {8: (16, "bd", "roll"), 16: (16, "bd", "mxu"),
                24: (16, "gdot", "mxu"), 32: (16, "gdot", "roll"),
                40: (16, "gdot", "mxu"), 48: (8, "gdot", "mxu"),
                56: (8, "gdot", "mxu"), 64: (8, "gdot", "mxu"),
                72: (8, "gdot", "mxu"), 80: (4, "gdot", "mxu"),
                88: (4, "gdot", "mxu"), 96: (4, "gdot", "mxu"),
                104: (4, "gdot", "mxu"), 112: (4, "gdot", "mxu")}


# widths where the "dg" dynamic-gather fetch beats the MXU one-hot
# fetch for lane-fusable queries (n1r == 8), with the winning group
# size; HW sweep 2026-08-21 (scripts/sweep_dg.py, TPU v5 lite): dg won
# EVERY width, 1.06-1.24x of the previous tuned config (1894 M it/s at
# d2=8, 311 at d2=112), always with cum="mxu"
TUNED_DG: dict[int, int] = {8: 16, 16: 8, 24: 8, 32: 8, 40: 8, 48: 8,
                            56: 8, 64: 4, 72: 4, 80: 8, 88: 4, 96: 4,
                            104: 4, 112: 4}

# same for two-plane queries (12 <= n1 <= 16): the fused query index
# spans 256 lanes, fetched as 2 gathers + a plane select; HW sweep
# 2026-08-21: wins 1.02-1.12x at mid widths, loses at 16 and 112.
# Beyond two planes dg LOSES outright (n1=19 -> 5 planes measured
# 0.59-0.80x of the MXU path at every width) — adoption stops here.
TUNED_DG16: dict[int, int] = {24: 8, 32: 8, 48: 8, 64: 4}

# "dgp" (packed single-gather dg) adoption per width for one-plane
# queries (n1r == 8): HW sweep 2026-08-21 (scripts/sweep_dgp.py, TPU
# v5 lite) — dgp beat the adopted dg at EVERY width, 1.05x (d2=8,
# 1785 M it/s) to 1.35x (d2=80), with the winning group sizes below.
# The dgs experiment had shown the dg gathers are data-bound; dgp
# halves the gathered data (code+dist packed into one f32), which dgs
# (issue-merging only) could not.
TUNED_DGP: dict[int, int] = {8: 16, 16: 16, 24: 16, 32: 8, 40: 8,
                             48: 8, 56: 8, 64: 4, 72: 4, 80: 4, 88: 4,
                             96: 4, 104: 4, 112: 4}

# dgp for TWO-PLANE queries (12 <= n1 <= 16): HW sweep 2026-08-21
# (scripts/sweep_dgp.py --n1 13) — dgp beat the prior config at EVERY
# width, 1.27x-1.58x (the 2-plane dg only won at 24-64; dgp's halved
# data + single plane-select extends the win to the full range).
TUNED_DGP16: dict[int, int] = {8: 16, 16: 16, 24: 8, 32: 8, 40: 8,
                               48: 4, 56: 4, 64: 4, 72: 4, 80: 4,
                               88: 4, 96: 4, 104: 16, 112: 16}

# dgp for FIVE-PLANE queries (n1r == 24, e.g. the 19-SSE d2phlb1):
# HW sweep 2026-08-21 (scripts/sweep_dgp.py --n1 19) over the default
# bucket widths — where plain dg had LOST outright (0.59-0.80x), the
# packed gather WINS at 8-64 (1.21-1.40x); 80 ties (1.00x) and 112
# loses (0.96x), so those widths keep the MXU one-hot fetch.  Queries
# beyond 24 round8 slots (n1 > 24) stay MXU — unswept, and the query
# plane count (and its VMEM) grows quadratically.
TUNED_DGP24: dict[int, int] = {8: 16, 16: 16, 24: 8, 32: 8, 48: 4,
                               64: 4}


def _dgp_table(npl: int) -> dict:
    """The HW-swept dgp adoption table for a query plane count."""
    return {1: TUNED_DGP, 2: TUNED_DGP16, 5: TUNED_DGP24}.get(npl, {})


def max_reachable_group(d2: int) -> int:
    """The largest entry-group size the AUTO fetch/group selection can
    pick for a bucket width, over every query plane count: the tail-
    padding quantum that makes the effective G — and therefore the
    G-keyed pltpu RNG streams — identical across mesh layouts (see
    pallas_search.chunk_layout).  Derived from the tuned tables so a
    re-sweep can never silently desynchronize it."""
    g = max(TUNED_DGP.get(d2, 1), TUNED_DGP16.get(d2, 1),
            TUNED_DGP24.get(d2, 1), TUNED_CONFIG.get(d2, (1,))[0])
    # choose_group's fallback formula also caps at 16 and only ever
    # REDUCES the table preference, so the table max is the ceiling
    return min(16, max(g, 1))


def choose_group(d2: int, n1r: int, cap: int | None = None) -> int:
    """Entries per grid step (see TUNED_CONFIG; measured on real HW).
    Falls back to a row-budget formula for widths not in the table.

    Always bounded so the query-side state stays VMEM-sized: the qb2
    scatter matrices are [G*n1r, G*n1r] and the supplied-mode uniforms
    [(n1+300)*G, 128] — both blow up with G for large queries."""
    qcap = 512 // n1r  # G*n1r <= 512 rows
    gmax = 1
    while gmax * 2 <= qcap:
        gmax *= 2
    if cap is None and d2 in TUNED_CONFIG:
        g = TUNED_CONFIG[d2][0]
        while g > 1 and g > gmax:
            g //= 2
        return max(1, g)
    w = max(d2, n1r)
    if cap is None:
        cap = 128 if w <= 16 else 256 if w <= 64 else 224
    g = 1
    while 2 * g * w <= cap and 2 * g <= 16:
        g *= 2
    return max(1, min(g, gmax))


def make_qb2(qtabp: np.ndarray, qdmat: np.ndarray, G: int):
    """Build the k-major scattered query matrices [n1r*G, G*n1r]:
    qb2t[k*G + g, g*n1r + i] = qtabp[k, i] (bf16 — packed codes <= 63
    are exact, so the one-hot fetch dot is exact in ONE MXU pass) and
    qb2d = the same scatter of qdmat (also bf16: distances are
    bf16-quantized at pack time, io/pack.py quantize_dmat, so the
    single-pass dot is exact too).  dot(qb2x, onehot[(g,i) ==
    (g, ssei_g)]) yields rows (k, g) = qtab/qdmat[k, ssei_g]."""
    eye = jnp.eye(G, dtype=F32)
    top = jnp.einsum("ki,gh->kghi", jnp.asarray(qtabp, F32), eye)
    bot = jnp.einsum("ki,gh->kghi", jnp.asarray(qdmat, F32), eye)
    n1r = qtabp.shape[0]
    return (top.reshape(n1r * G, G * n1r).astype(BF16),
            bot.reshape(n1r * G, G * n1r).astype(BF16))


def make_qb2_batched(qtabps, qdmats, G: int):
    """make_qb2 over a stacked query axis: [K, n1r, n1r] -> two
    [K, n1r*G, G*n1r] scattered matrices."""
    eye = jnp.eye(G, dtype=F32)
    K, n1r = qtabps.shape[:2]
    top = jnp.einsum("qki,gh->qkghi", jnp.asarray(qtabps, F32), eye)
    bot = jnp.einsum("qki,gh->qkghi", jnp.asarray(qdmats, F32), eye)
    return (top.reshape(K, n1r * G, G * n1r).astype(BF16),
            bot.reshape(K, n1r * G, G * n1r).astype(BF16))


def dg_planes(n1r: int) -> int:
    """Lane planes the "dg" query fetch needs: the fused (revmap, ssei)
    index spans n1r*n1r values, 128 per plane."""
    return -(-n1r * n1r // C_LANES)


def make_qflat(qtabp: np.ndarray, qdmat: np.ndarray):
    """Lane-fused query matrices for the "dg" fetch mode:
    [8*planes, 128] (code, dist) vectors where plane p's row block
    holds lanes [128p, 128p + 128) of the flattened qtabp/qdmat — lane
    j of plane p = value at flat index 128p + j (rows within a block
    broadcast, the kernel reads row 8p).  The kernel reads the query
    value of pair (revmap[l], ssei) with one per-lane dynamic gather
    per plane at the fused index revmap*n1r + ssei (plane-selected for
    n1r > 11; ONE gather when n1r*n1r <= 128)."""
    n1r = qtabp.shape[0]
    npl = dg_planes(n1r)

    def flat(x):
        v = jnp.asarray(x, F32).reshape(1, -1)
        v = jnp.pad(v, ((0, 0), (0, npl * C_LANES - n1r * n1r)))
        v = v.reshape(npl, 1, C_LANES)
        return jnp.broadcast_to(v, (npl, 8, C_LANES)).reshape(
            npl * 8, C_LANES)

    return flat(qtabp), flat(qdmat)


def make_qflat_batched(qtabps, qdmats):
    """make_qflat over a stacked query axis: [K, n1r, n1r] -> two
    [K, 8*planes, 128]."""
    K, n1r = qtabps.shape[:2]
    npl = dg_planes(n1r)

    def flat(x):
        v = jnp.asarray(x, F32).reshape(K, 1, -1)
        v = jnp.pad(v, ((0, 0), (0, 0),
                        (0, npl * C_LANES - n1r * n1r)))
        v = v.reshape(K, npl, 1, C_LANES)
        return jnp.broadcast_to(v, (K, npl, 8, C_LANES)).reshape(
            K, npl * 8, C_LANES)

    return flat(qtabps), flat(qdmats)


def choose_fetch(d2: int, group: int | None = None,
                 n1r: int | None = None) -> str:
    """Column-fetch strategy for the one-hot tableau/distance reads.

    'bd': all G entries in one [G*d2, G*d2] block-diagonal MXU dot per
    column block — perfectly MXU-shaped but quadratic in G (the
    off-diagonal blocks are zero).  'gdot': one entry per [d2, d2] x
    [d2, W] dot — minimal FLOPs but issue-bound at large G.  'bd<k>':
    the unified blocked form, k entries per block.  'dg': per-lane
    dynamic gathers (tpu.dynamic_gather along lanes) replace BOTH the
    one-hot MXU fetch (cost O(d2^2) per move) and the per-query-SSE
    revmap select loop with three [DQ, C] gathers from padded
    [DQ, 128] value planes — per-move cost O(d2), like the reference's
    per-thread deltasd (kernel.cu:502-535); needs n1r*n1r <= 128
    lanes (n1r == 8) for the fused (revmap, ssei) query index.
    Measured on real HW: one 'bd' block wins while G*d2 <= 256;
    'dg' adoption per width lives in TUNED_DG / TUNED_DG16 (HW-swept).
    """
    if n1r is not None:
        npl = dg_planes(n1r)
        if d2 in _dgp_table(npl):
            return "dgp"
        if (npl == 1 and d2 in TUNED_DG) or (npl == 2
                                             and d2 in TUNED_DG16):
            return "dg"
    if d2 in TUNED_CONFIG:
        fetch = TUNED_CONFIG[d2][1]
        if fetch == "bd" and group is not None and group * d2 > 512:
            return f"bd{max(1, 256 // d2)}"
        return fetch
    if group is not None and group * d2 <= 256:
        return "bd"
    return f"bd{max(1, 256 // d2)}"


def choose_cum(d2: int) -> str:
    """Candidate-rank cumulative-sum strategy (see ``cum`` below)."""
    if d2 in TUNED_CONFIG:
        return TUNED_CONFIG[d2][2]
    return "mxu" if d2 >= 24 else "roll"


def effective_group(E: int, d2: int, n1: int, group: int | None = None,
                    fetch: str = "auto") -> int:
    """The entry-group size ``make_pallas2_bucket_search(E, n1, d2,
    ..., fetch, group)`` will actually run with: the tuned preference,
    clamped to E and then to E's largest divisor.  This is the SINGLE
    source of the G pick — the kernel factory calls it, and mesh
    dispatch uses it to assert a sharded build (local E/ndev entries)
    lands on the SAME G as the unsharded one: G seeds the group-leader
    pltpu RNG streams, so a silent G-fallback difference between the
    two builds would break sharded==unsharded bitwise parity without
    any error (see pallas_search._make_db_fnK/_make_db_fn2)."""
    n1r = round8(n1)
    if fetch == "auto":
        fetch = choose_fetch(d2, None, n1r)
    npl = dg_planes(n1r)
    if group is None and fetch == "dgp":
        group = (_dgp_table(npl).get(d2)
                 or (TUNED_DG if npl == 1 else TUNED_DG16).get(d2))
    if group is None and fetch in ("dg", "dgs"):
        group = (TUNED_DG if npl == 1 else TUNED_DG16).get(d2)
    G = min(group if group is not None else choose_group(d2, n1r), E)
    while E % G:
        G -= 1
    return G


@functools.lru_cache(maxsize=None)
def make_pallas2_bucket_search(E: int, n1: int, d2: int, c_par: int,
                               r_seq: int, lorder: bool,
                               params: SAParams = DEFAULTS,
                               interpret: bool = False,
                               rng_mode: str = "supplied",
                               lsoln: bool = True,
                               fetch: str = "auto",
                               group: int | None = None,
                               cum: str = "auto",
                               cumb: int | None = None,
                               nq: int = 1,
                               batched_api: bool = False,
                               knock: frozenset = frozenset(),
                               unroll: int = 1):
    """Build the grouped pallas_call for an E-entry chunk (G | E).

    The kernel is specialized on ``round8(n1)`` ONLY: the exact query
    order is a RUNTIME input (``n1s_i32[nq]``, one per query), so any
    mix of query orders within an 8-padded bucket shares one compiled
    kernel — and, under the n1r RNG slot schedule (ops/common.py),
    one stream layout, making mixed-order batches bitwise-identical to
    sequential dispatch.

    With nq == 1, returns
        fn(n2_i32[E], qtypes_i32[n1r] (SMEM),
           qb2t_bf16[n1r*G, NQ], qb2d_bf16[n1r*G, NQ],
           types2_i32[E*d2, 1],
           tab2p_f32[E*d2, d2], dmat2_f32[E*d2, d2], rng_input,
           n1s_i32[1])
         -> (scores_i32[E//G, G, C], bestmaps_i32[E//G, G*n1r, 1])
            (bestmaps only when lsoln)

    With nq > 1, a QUERY GRID AXIS batches nq same-n1r queries into
    this one pallas_call (grid (E//G, nq, r_seq), query blocks indexed
    by the middle grid dim) — the per-call fixed cost (launch, VMEM
    alloc, glue ops) is paid once per chunk instead of once per
    (chunk, query).  Query-side args then carry a leading nq axis and a
    ``tags_i32[nq]`` arg replaces the packed tag slot:
        fn(n2, qtypes[nq,n1r], qb2t[nq,...], qb2d[nq,...],
           types2, tab2p, dmat2, rng_input, tags, n1s_i32[nq])
         -> (scores_i32[nq, E//G, G, C], bestmaps[nq, E//G, NQ, 1])
    RNG streams are keyed (seed, tag, entry, restart) exactly as in the
    nq == 1 path, so batched == sequential bitwise.

    rng_input: uniforms_f32[(nq,) E//G, r_seq, P*G, C] (slot-major) for
    "supplied"; (seed, tag, indices[E]) int32[2+E] (SMEM) for "pltpu"
    (tag slot ignored when nq > 1 — tags come from the tags arg).

    ``cum``: candidate-rank cumulative sum — "mxu" contracts the 0/1
    candidate mask with a lower-triangular ones matrix (exact in bf16:
    counts <= d2), "roll" uses log2(d2) masked-roll VPU steps.

    ``knock``: PROFILING ONLY — a set of kernel-stage names
    ({"thinit", "initscore", "gather", "lorder", "fetch", "tsc",
    "rng"}) replaced by cheap stand-ins, so wall-clock deltas
    attribute the per-iteration budget (scripts/profile_iter.py).
    Results are wrong under any knock.
    """
    p = params
    maxiter = p.maxiter
    n1r = round8(n1)
    P = n1r + 3 * maxiter  # the n1r slot schedule (ops/common.py)
    _group_arg, _fetch_arg = group, fetch  # for the lockstep assert
    auto_fetch = fetch == "auto"
    if auto_fetch:
        fetch = choose_fetch(d2, None, n1r)  # "dg" is group-free
    dgs = fetch == "dgs"  # dg with the 6 per-move gathers STACKED
    # into 2 (db old+new codes+dists in one [4DQ, C] gather, query
    # code+dist in one [2DQ, C] gather) — fewer issues, same data.
    # HW-measured NEUTRAL vs plain dg (within +-1% at every width:
    # the gathers are data-bound, not issue-bound), so auto never
    # selects it; kept as a tested variant for future chips where the
    # issue/data balance may differ.
    dgp = fetch == "dgp"
    # "dgp": dg with PACKED value planes — tableau code and bf16-grid
    # distance fused into ONE f32 per element (the pack_qc format), so
    # each per-move fetch is ONE gather instead of two: 6 [DQ, C]
    # gathers per iteration drop to 3.  The dgs experiment showed the
    # gathers are data-bound, and dgp HALVES the gathered data (dgs
    # only merged issues); unpack is ~4 cheap VPU ops per plane.
    # Bitwise-identical values: distances are bf16-quantized at pack
    # time (io/pack.py), so their f32 bits survive the 16-bit split.
    dg = fetch == "dg" or dgs or dgp
    NPL = dg_planes(n1r) if dg else 0  # query-fetch lane planes
    assert not dgs or NPL == 1, (fetch, n1r)
    # the G pick lives in effective_group — the SAME function mesh
    # dispatch consults for its sharded==unsharded G assert, so the
    # two can never drift
    G = effective_group(E, d2, n1, _group_arg, _fetch_arg)
    if auto_fetch and not dg:
        fetch = choose_fetch(d2, G)  # group-aware bd<k> adjustment
    if cum == "auto":
        cum = "mxu" if dg else choose_cum(d2)  # dg sweep: mxu won
        # at every width
    assert E % G == 0, (E, G)
    EG = E // G
    C = C_LANES
    NEG = p.maxscore_init
    BIG = n1r + d2 + 999
    DQ = G * d2  # db-side flat rows
    NQ = G * n1r  # query-side flat rows
    NQH = n1r * G  # qb2 half offset (same value, named for clarity)
    PG = P * G  # uniforms rows per restart (slot-major)
    kloop_unroll = n1r <= 32
    # entries per fetch/cum MXU block: "bd" = all G in one block-
    # diagonal dot (quadratic in G), "gdot" = one entry per dot
    # (issue-bound at large G), "bd<k>" = k per block — the unified
    # blocked form; B must divide G.  "dg" has no fetch blocks; the
    # blocking then only shapes cum="mxu"'s tril dots (``cumb``
    # entries per block-diagonal dot, default the ~256-row heuristic:
    # fewer dot issues at small widths, bounded FLOPs at wide).
    if fetch == "bd":
        B = G
    elif dg:
        B = min(G, cumb if cumb else max(1, 256 // d2))
    elif fetch == "gdot":
        B = 1
    else:
        B = min(G, int(fetch[2:]))
    while G % B:
        B -= 1
    BD = B * d2  # fetch-block rows
    NB = DQ // BD

    def iota_d():  # flat db-side iota
        return lax.broadcasted_iota(I32, (DQ, C), 0)

    def iota_q():
        return lax.broadcasted_iota(I32, (NQ, C), 0)

    def l_idx():
        return iota_d() % d2

    def k_idx():
        return iota_q() % n1r

    def lanes():
        return lax.broadcasted_iota(I32, (G, C), 1)

    def rep_d(x):
        """[G, C] per-entry values -> [G*d2, C] (segment broadcast)."""
        return jnp.broadcast_to(x[:, None, :], (G, d2, C)).reshape(DQ, C)

    def rep_q(x):
        return jnp.broadcast_to(x[:, None, :], (G, n1r, C)).reshape(NQ, C)

    def seg_sum_d(x):
        return jnp.sum(x.reshape(G, d2, C), axis=1)

    def seg_min_d(x):
        return jnp.min(x.reshape(G, d2, C), axis=1)

    def seg_max_d(x):
        return jnp.max(x.reshape(G, d2, C), axis=1)

    def seg_sum_q(x):
        return jnp.sum(x.reshape(G, n1r, C), axis=1)

    def seg_min_q(x):
        return jnp.min(x.reshape(G, n1r, C), axis=1)

    def seg_max_q(x):
        return jnp.max(x.reshape(G, n1r, C), axis=1)

    def prefix_sum_seg(x, roll_masks):
        """Inclusive prefix sum within each d2 segment (masked rolls:
        p - s stays in-segment iff l_idx(p) >= s; the loop-invariant
        step masks are hoisted to the kernel top)."""
        s = 1
        while s < d2:
            x = x + jnp.where(roll_masks[s], pltpu.roll(x, s, 0), 0.0)
            s *= 2
        return x

    def pack_qc(qct, qcd):
        """Pack the query column pair into ONE f32 per row: bf16 bit
        pattern of the distance * 64 + tableau code (<= 2^22, f32-exact;
        distances are on the bf16 grid so their f32 bits have zero low
        halves).  One gather accumulator instead of two."""
        bits = jax.lax.shift_right_logical(
            pltpu.bitcast(qcd, jnp.uint32), jnp.uint32(16))
        return pltpu.bitcast(bits, I32).astype(F32) * 64.0 + qct

    def unpack_qc(qs):
        """(code_f32, dist_f32) from a packed/gathered qc value; zero
        unpacks to (0, 0.0) like the old two-array gather."""
        b = jnp.floor(qs * 0.015625)
        code = qs - b * 64.0
        dist = pltpu.bitcast(
            jax.lax.shift_left(b.astype(I32), 16), F32)
        return code, dist

    def make_gather_by_revmap(qc_s):
        """Build the revmap gather: qs[p, c] = qc[(revmap[p, c], g(p)), c]
        — the packed query-side value of the SSE each mapped db SSE is
        matched to.  Rows with revmap < 0 keep 0 (callers gate).

        For small/medium n1 the k loop unrolls with static value
        slices; for large n1 it stays a fori_loop reading [G, C] slices
        from the qc_s scratch ref (Mosaic cannot lower dynamic_slice on
        a VALUE inside a loop, only dynamic ref indexing)."""
        def gather(qc, rmap_v):
            if "gather" in knock:  # profiling stand-in
                return rep_d(qc[0:G])

            def body(k, qs):
                qv = qc_s[pl.ds(k * G, G), :]
                return jnp.where(rmap_v == k, rep_d(qv), qs)

            qs = jnp.zeros((DQ, C), F32)
            if kloop_unroll:
                for k in range(n1r):  # padded k never appear in rmap_v
                    qs = jnp.where(rmap_v == k,
                                   rep_d(qc[k * G:(k + 1) * G]), qs)
                return qs
            qc_s[...] = qc
            return lax.fori_loop(0, n1r, body, qs)

        return gather

    def unpack_tsc(packed, qhi, qlo):
        if "tsc" in knock:  # profiling stand-in
            return packed + qhi - qlo
        dhi = jnp.floor(packed / 8.0)
        dlo = packed - dhi * 8.0
        he = dhi == qhi
        le = dlo == qlo
        return jnp.where(he & le, 2.0, jnp.where(he | le, 1.0, -2.0))

    def kernel(*refs):
        (n2_ref, qtypes_ref, qb2t_ref, qb2d_ref, types2_ref,
         tab2p_ref, dmat2_ref, rng_ref, tags_ref, n1s_ref, outscore_ref,
         *rest) = refs
        rest = list(rest)
        outbest_ref = rest.pop(0) if lsoln else None
        ssemap, revmap, score, maxscore = rest[:4]
        rest = rest[4:]
        bestmap = rest.pop(0) if lsoln else None
        qc_s = None
        bd_all = dbc_s = dbd_s = qfc_s = qfd_s = None
        dbcd_s = qfcd_s = dbp_s = qfp_s = None
        if dgs:
            # stacked planes: one gather serves old+new codes+dists
            dbcd_s = rest.pop(0)  # [4DQ, C]: codes, dists, codes, dists
            qfcd_s = rest.pop(0)  # [2DQ, C]: query codes, dists
        elif dgp:
            # packed planes: ONE f32 per element carries code AND dist
            # (pack_qc format), so every fetch is a single gather
            dbp_s = rest.pop(0)  # [DQ, C] packed db code+dist, cols j
            qfp_s = rest.pop(0)  # [NPL*DQ, C] packed query code+dist
        elif dg:
            # padded per-lane value planes for the dynamic gathers
            dbc_s = rest.pop(0)  # [DQ, C] db packed codes (cols j)
            dbd_s = rest.pop(0)  # [DQ, C] db distances
            qfc_s = rest.pop(0)  # [DQ, C] query codes, lanes k*n1r+i
            qfd_s = rest.pop(0)  # [DQ, C] query distances
        else:
            if not kloop_unroll:
                qc_s = rest.pop(0)
            bd_all = rest.pop(0)  # [2DQ, BD]: tab rows above dmat
        tril = rest.pop(0) if cum == "mxu" else None

        # loop-invariant index planes, computed once per grid step
        li = l_idx()
        ki = k_idx()
        roll_masks = None
        if cum != "mxu":
            roll_masks = {}
            s = 1
            while s < d2:
                roll_masks[s] = li >= s
                s *= 2

        eg = pl.program_id(0)
        q = pl.program_id(1)
        r = pl.program_id(2)
        n1v = n1s_ref[q]  # exact order of this query (runtime; the
        # kernel is specialized on n1r = round8(n1) only)

        # ---- per-entry order column [G, C]
        n2col = jnp.concatenate(
            [jnp.full((1, C), n2_ref[eg * G + g], I32) for g in range(G)],
            axis=0)

        # ---- query types packed 4 bits/SSE into scalar words (cheap
        # per-lane extraction at ssei, replacing a [NQ, C] masked
        # reduction per iteration); padded slots (type 127 -> nibble
        # 15) are never selected since ssei < n1v
        nwords = (n1r + 7) // 8
        qtw = []
        for w in range(nwords):
            acc = None
            for i in range(w * 8, min(n1r, w * 8 + 8)):
                term = (qtypes_ref[q, i] & 15) << ((i - w * 8) * 4)
                acc = term if acc is None else acc | term
            qtw.append(acc)

        def qtype_at(ssei):
            """qtypes[q, ssei] per lane, [G, C] (ssei < n1v <= n1r)."""
            if nwords == 1:
                wv = qtw[0]
                sh = jnp.left_shift(ssei, 2)
            else:
                shi = jnp.right_shift(ssei, 3)
                wv = jnp.where(shi == 0, qtw[0], qtw[1])
                for w in range(2, nwords):
                    wv = jnp.where(shi == w, qtw[w], wv)
                sh = jnp.left_shift(ssei & 7, 2)
            # arithmetic shift is fine: the target nibble lands in bits
            # 0-3 either way and & 15 drops any sign fill
            return jnp.right_shift(wv, sh) & 15

        if cum == "mxu":
            # lower-triangular ones, block-diagonal per entry within
            # ONE [BD, BD] fetch block (identical for every block)
            @pl.when(jnp.logical_and(eg == 0,
                                     jnp.logical_and(q == 0, r == 0)))
            def _():
                ri = lax.broadcasted_iota(I32, (BD, BD), 0)
                ci = lax.broadcasted_iota(I32, (BD, BD), 1)
                cond = ((ri % d2) >= (ci % d2)) & ((ri // d2)
                                                   == (ci // d2))
                tril[...] = jnp.where(cond, 1.0, 0.0).astype(BF16)

        # ---- block-diagonal tables, built once per entry group
        # (grid order (eg, q, r): the q == 0 build survives the whole
        # q sweep for this eg).  B entries per block; within block b,
        # tab rows stacked ABOVE dmat rows so one [2BD, BD] x [BD, W]
        # dot fetches tableau and distance columns together.
        if not dg:
            @pl.when(jnp.logical_and(q == 0, r == 0))
            def _():
                if B > 1:
                    bd_all[...] = jnp.zeros((2 * DQ, BD), BF16)
                for g in range(G):
                    b, e = divmod(g, B)
                    rows = pl.ds(2 * b * BD + e * d2, d2)
                    rows_d = pl.ds(2 * b * BD + BD + e * d2, d2)
                    cols = pl.ds(e * d2, d2)
                    src = pl.ds(g * d2, d2)
                    bd_all[rows, cols] = tab2p_ref[src, :].astype(BF16)
                    bd_all[rows_d, cols] = dmat2_ref[src, :].astype(BF16)
        else:
            # "dg" value planes: db rows padded to the full lane width
            # (built once per entry group), query vectors broadcast
            # down the rows (once per query sweep position)
            cpad = (jnp.zeros((DQ, C - d2), F32) if d2 < C else None)

            @pl.when(jnp.logical_and(q == 0, r == 0))
            def _():
                t = tab2p_ref[...]
                d = dmat2_ref[...]
                if cpad is not None:
                    t = jnp.concatenate([t, cpad], axis=1)
                    d = jnp.concatenate([d, cpad], axis=1)
                if dgs:
                    # [codes; dists; codes; dists] — ONE gather then
                    # serves both the old and the new column
                    for blk, v in ((0, t), (1, d), (2, t), (3, d)):
                        dbcd_s[pl.ds(blk * DQ, DQ), :] = v
                elif dgp:
                    dbp_s[...] = pack_qc(t, d)
                else:
                    dbc_s[...] = t
                    dbd_s[...] = d

            @pl.when(r == 0)
            def _():
                if dgs:
                    qfcd_s[pl.ds(0, DQ), :] = jnp.broadcast_to(
                        qb2t_ref[0:1, :], (DQ, C))
                    qfcd_s[pl.ds(DQ, DQ), :] = jnp.broadcast_to(
                        qb2d_ref[0:1, :], (DQ, C))
                elif dgp:
                    for pp in range(NPL):
                        qfp_s[pl.ds(pp * DQ, DQ), :] = jnp.broadcast_to(
                            pack_qc(qb2t_ref[8 * pp:8 * pp + 1, :],
                                    qb2d_ref[8 * pp:8 * pp + 1, :]),
                            (DQ, C))
                else:
                    for pp in range(NPL):
                        rows = pl.ds(pp * DQ, DQ)
                        qfc_s[rows, :] = jnp.broadcast_to(
                            qb2t_ref[8 * pp:8 * pp + 1, :], (DQ, C))
                        qfd_s[rows, :] = jnp.broadcast_to(
                            qb2d_ref[8 * pp:8 * pp + 1, :], (DQ, C))

        @pl.when(r == 0)
        def _():
            maxscore[...] = jnp.full((G, C), NEG, I32)
            if lsoln:
                bestmap[...] = jnp.full((NQ, C), -1, I32)

        if rng_mode == "pltpu":
            # seed once per grid step; slots are then DRAWN ON DEMAND
            # in consumption order (thinit: one [G, C] block per query
            # SSE, annealing: one [3G, C] block per iteration).  When
            # every draw's row count is a multiple of 8 (G % 8 == 0,
            # the sublane quantum) the chunked draws equal one big
            # [P*G, C] buffer fill; for smaller G the stream is a
            # VALID but DIFFERENT pltpu stream (still deterministic in
            # (seed, tag, entry, restart) — cross-backend bitwise
            # parity always uses supplied mode)
            s1 = (rng_ref[0] * I32(-1640531527)
                  + tags_ref[q] * I32(97))
            s2 = (rng_ref[2 + eg * G] * I32(2057)
                  + r * I32(-1105766181))
            pltpu.prng_seed(s1, s2)

        def read_u(slot, nrows):
            """next nrows*G uniform rows (slot = consumption cursor,
            used only by the supplied-stream path)."""
            if rng_mode == "pltpu":
                if "rng" in knock:  # profiling stand-in
                    return jnp.full((nrows * G, C), 0.4321, F32)
                bits = pltpu.prng_random_bits((nrows * G, C))
                bits24 = pltpu.bitcast(
                    jax.lax.shift_right_logical(
                        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)),
                    jnp.int32)
                return bits24.astype(F32) * F32(2.0 ** -24)
            return rng_ref[0, 0, pl.ds(slot * G, nrows * G), :]

        types2 = types2_ref[...]  # [DQ, 1]
        g_q = g_all = None
        if not dg:
            # query scatter matrices stacked once per grid step (codes
            # are <= 27 and distances bf16-quantized at pack time, so
            # both halves are bf16-exact): ONE [2NQH, NQ] x [NQ, C]
            # dot per iteration fetches code and distance columns
            # together
            g_q = jnp.concatenate([qb2t_ref[...], qb2d_ref[...]], axis=0)
            g_all = bd_all[...]  # [2DQ, BD] bf16

        def fetch_db(jcol, jcol_d=None):
            """"dg": (codes [DQ, C], dists [DQ, C]) at column jcol
            ([G, C], may be -1: clamped, callers gate) of each entry's
            tableau/distance rows — two per-lane dynamic gathers (one
            stacked [2DQ, C] gather under "dgs").  ``jcol_d``: optional
            pre-broadcast [DQ, C] copy of jcol (callers that already
            materialized rep_d(jcol) pass it to skip a second
            broadcast)."""
            if "fetch" in knock:  # profiling stand-in
                f = jcol.astype(F32)
                return rep_d(f), rep_d(f * 2.0)
            idx = jnp.maximum(rep_d(jcol) if jcol_d is None else jcol_d,
                              0)
            if dgs:
                v = jnp.take_along_axis(
                    dbcd_s[pl.ds(0, 2 * DQ), :],
                    jnp.concatenate([idx, idx], axis=0), axis=1)
                return v[0:DQ], v[DQ:2 * DQ]
            if dgp:
                return unpack_qc(
                    jnp.take_along_axis(dbp_s[...], idx, axis=1))
            return (jnp.take_along_axis(dbc_s[...], idx, axis=1),
                    jnp.take_along_axis(dbd_s[...], idx, axis=1))

        def fetch_db_pair(oldd_c, newd_c):
            """"dgs": (codes_o, dists_o, codes_n, dists_n), all
            [DQ, C], in ONE stacked [4DQ, C] gather (pre-broadcast
            [DQ, C] column indices; -1 clamped, callers gate)."""
            if "fetch" in knock:  # profiling stand-in
                fo = oldd_c.astype(F32)
                fn_ = newd_c.astype(F32)
                return fo, fo * 2.0, fn_, fn_ * 2.0
            idx4 = jnp.maximum(jnp.concatenate(
                [oldd_c, oldd_c, newd_c, newd_c], axis=0), 0)
            v = jnp.take_along_axis(dbcd_s[...], idx4, axis=1)
            return (v[0:DQ], v[DQ:2 * DQ], v[2 * DQ:3 * DQ],
                    v[3 * DQ:4 * DQ])

        def fetch_q(rmap_v, sseid):
            """"dg": query (codes, dists) of pair (revmap[l], ssei) per
            db row — one gather per lane plane at the fused index
            revmap*n1r + ssei (ONE when n1r*n1r <= 128; plane-selected
            beyond; tableaux are symmetric, so the (k, i) orientation
            is free); unmapped rows (revmap < 0) gather plane-0 junk
            that every consumer gates on revmap >= 0."""
            if "gather" in knock:  # profiling stand-in
                f = sseid.astype(F32)
                return f, f * 2.0
            idx = jnp.maximum(rmap_v, 0) * n1r + sseid
            if dgs:
                v = jnp.take_along_axis(
                    qfcd_s[...], jnp.concatenate([idx, idx], axis=0),
                    axis=1)
                return v[0:DQ], v[DQ:2 * DQ]
            if dgp:
                if NPL == 1:
                    return unpack_qc(
                        jnp.take_along_axis(qfp_s[...], idx, axis=1))
                lane = idx & (C - 1)
                out = jnp.take_along_axis(qfp_s[0:DQ, :], lane, axis=1)
                plane = jnp.right_shift(idx, 7)
                for pp in range(1, NPL):
                    m = plane == pp
                    out = jnp.where(m, jnp.take_along_axis(
                        qfp_s[pl.ds(pp * DQ, DQ), :], lane, axis=1),
                        out)
                return unpack_qc(out)
            if NPL == 1:
                return (jnp.take_along_axis(qfc_s[...], idx, axis=1),
                        jnp.take_along_axis(qfd_s[...], idx, axis=1))
            lane = idx & (C - 1)
            out_c = jnp.take_along_axis(qfc_s[0:DQ, :], lane, axis=1)
            out_d = jnp.take_along_axis(qfd_s[0:DQ, :], lane, axis=1)
            plane = jnp.right_shift(idx, 7)
            for pp in range(1, NPL):
                m = plane == pp
                rows = pl.ds(pp * DQ, DQ)
                out_c = jnp.where(m, jnp.take_along_axis(
                    qfc_s[rows, :], lane, axis=1), out_c)
                out_d = jnp.where(m, jnp.take_along_axis(
                    qfd_s[rows, :], lane, axis=1), out_d)
            return out_c, out_d

        def fetch_cols(oh):
            """(tab cols [DQ, W], dmat cols [DQ, W]) for a [DQ, W]
            one-hot block — one [2BD, BD] x [BD, W] dot per fetch
            block (codes <= 27 and bf16-grid distances: exact in the
            f32 accumulator)."""
            if "fetch" in knock:  # profiling stand-in
                f = oh.astype(F32)
                return f, f * 2.0
            outs = [jnp.dot(g_all[2 * b * BD:2 * (b + 1) * BD],
                            oh[b * BD:(b + 1) * BD],
                            preferred_element_type=F32)
                    for b in range(NB)]
            if NB == 1:
                return outs[0][:BD], outs[0][BD:]
            tabs = jnp.concatenate([o[:BD] for o in outs], axis=0)
            dmats = jnp.concatenate([o[BD:] for o in outs], axis=0)
            return tabs, dmats

        def cum_seg(candf):
            """Inclusive per-segment cumulative count of the 0/1
            candidate mask (the rank each candidate would have)."""
            if cum == "mxu":
                cf = candf.astype(BF16)
                t = tril[...]
                outs = [jnp.dot(t, cf[b * BD:(b + 1) * BD],
                                preferred_element_type=F32)
                        for b in range(NB)]
                return (outs[0] if NB == 1
                        else jnp.concatenate(outs, axis=0))
            return prefix_sum_seg(candf, roll_masks)

        # ---- thinit (kernel.cu:588-648)
        ssemap[...] = jnp.full((NQ, C), -1, I32)
        revmap[...] = jnp.full((DQ, C), -1, I32)
        n2d = rep_d(n2col)

        def thinit_body(i, carry):
            j, stopped = carry  # [G, C] each; stopped int32
            u_i = read_u(i, 1)  # [G, C]
            t1 = qtypes_ref[q, i]
            attempt = ((u_i < p.init_matchprob) & (stopped == 0)
                       & (i < n1v))  # padded SSEs never attempt
            cmask = (li >= rep_d(j)) & (types2 == t1) & (li < n2d)
            jfound = seg_min_d(jnp.where(cmask, li, BIG))  # [G, C]
            ok = attempt & (jfound < n2col)
            stopped = jnp.where(attempt & (jfound >= n2col), 1, stopped)
            okv = jnp.where(ok, 1, 0)
            ssemap[...] = jnp.where((ki == i) & (rep_q(okv) == 1),
                                    rep_q(jfound), ssemap[...])
            revmap[...] = jnp.where(
                (li == rep_d(jfound)) & (rep_d(okv) == 1), i, revmap[...])
            return jnp.where(ok, jfound + 1, j), stopped

        if "thinit" not in knock:
            lax.fori_loop(0, n1r, thinit_body,
                          (jnp.zeros((G, C), I32), jnp.zeros((G, C), I32)))

        # ---- initial full score (tmscord, kernel.cu:396-440): for
        # each query SSE i sum the contributions of all pairs (i, k)
        # over mapped db SSEs l (k = revmap[l]); every pair is counted
        # twice (at i and at k), and the tableau scores are small
        # integers, so halving the f32 sum is exact.
        gather_by_revmap = (None if dg else make_gather_by_revmap(qc_s))

        def initscore_body(i, acc):
            rmap_v = revmap[...]
            l_i = seg_sum_q(jnp.where(ki == i, ssemap[...], 0))  # [G, C]
            lid = rep_d(l_i)
            if dg:
                pt, rd = fetch_db(l_i)
                codeq, qs_d = fetch_q(rmap_v, i)
            else:
                oh_i = li == lid
                pt, rd = fetch_cols(oh_i.astype(BF16))
                ohc = (ki == i).astype(BF16)  # [NQ, C]
                qc2 = jnp.dot(g_q, ohc, preferred_element_type=F32)
                qs = gather_by_revmap(pack_qc(qc2[:NQH], qc2[NQH:]),
                                      rmap_v)
                codeq, qs_d = unpack_qc(qs)
            qhi = jnp.floor(codeq * 0.125)
            qlo = codeq - qhi * 8.0
            use = ((rmap_v >= 0) & (rmap_v != i) & (lid >= 0)
                   & (jnp.abs(qs_d - rd) <= p.mxssed))
            tsc = unpack_tsc(pt, qhi, qlo)
            return acc + seg_sum_d(jnp.where(use, tsc, 0.0))

        if "initscore" in knock:
            score[...] = jnp.zeros((G, C), I32)
        else:
            # padded query SSEs (i >= n1v) contribute 0: their ssemap
            # row is -1, gating every pair via `use`
            pairsum = lax.fori_loop(0, n1r, initscore_body,
                                    jnp.zeros((G, C), F32))
            score[...] = (pairsum * 0.5).astype(I32)

        improved0 = score[...] > maxscore[...]
        maxscore[...] = jnp.where(improved0, score[...], maxscore[...])
        if lsoln:
            bestmap[...] = jnp.where(
                rep_q(jnp.where(improved0, 1, 0)) == 1, ssemap[...],
                bestmap[...])

        # ---- annealing loop (kernel.cu:1032-1191)
        def iter_body(it, temp):
            smap_v = ssemap[...]
            rmap_v = revmap[...]
            u3 = read_u(n1r + 3 * it, 3)  # [3G, C]
            u_move = u3[0:G, :]
            u_cand = u3[G:2 * G, :]
            u_acc = u3[2 * G:3 * G, :]

            ssei = ((u_move - p.eps)
                    * n1v.astype(F32)).astype(I32)  # [G, C]
            sseiq = rep_q(ssei)
            m1 = ki == sseiq  # [NQ, C]

            qt = qtype_at(ssei)  # [G, C]

            if lorder and "lorder" not in knock:
                # Under LORDER every reachable mapping is order-
                # preserving (thinit's db cursor is monotone and every
                # accepted move lands strictly between its mapped
                # neighbours), so ssemap restricted to mapped k is
                # strictly increasing — the window endpoints are then
                # direct segment reductions over the VALUES:
                #   startj = max smap[k] over mapped k <= ssei
                #   endj   = min smap[k] over mapped k > ssei
                # (unmapped slots hold -1, the max-reduce sentinel, so
                # the sv mask needs no mapped test).
                m_le = ki <= sseiq
                sv = seg_max_q(jnp.where(m_le, smap_v, -1))
                startj = jnp.where(sv >= 0, sv, n2col)
                # one fused mask: rows at-or-below ssei AND unmapped
                # rows both map to the BIG sentinel for the min
                ev = seg_min_q(jnp.where(m_le | (smap_v < 0), BIG,
                                         smap_v))
                endj = jnp.where(ssei == n1v - 1, n2col,
                                 jnp.where(ev < BIG, ev, -1))
            else:
                startj = jnp.zeros((G, C), I32)
                endj = n2col

            if "select" in knock:  # profiling stand-in
                newj = (rep_d(startj) * 0 + li)[0:G, :] % d2
            else:
                cand = ((li >= rep_d(startj)) & (li < rep_d(endj))
                        & (types2 == rep_d(qt)) & (rmap_v < 0))
                candf = cand.astype(F32)
                # (count could be read from cum_seg's last in-segment
                # element instead of a second reduce; interleaved HW
                # A/B measured that EXACTLY neutral — the compiler
                # already overlaps these — so the simpler form stays)
                count = seg_sum_d(candf)  # [G, C]
                rpick = ((u_cand - p.eps) * count).astype(I32)
                cum = cum_seg(candf).astype(I32)
                hit = cand & (cum == rep_d(rpick) + 1)
                newj = seg_max_d(jnp.where(hit, li, -1))  # [G, C]

            oldj = seg_sum_q(jnp.where(m1, smap_v, 0))  # [G, C]

            oldd = rep_d(oldj)
            newd = rep_d(newj)
            sseid = rep_d(ssei)
            if dg:
                # db values at columns oldj/newj and the query value of
                # pair (revmap[l], ssei): five per-lane dynamic gathers
                # replace the one-hot MXU fetch + revmap select loop
                # (index broadcasts reuse the oldd/newd planes computed
                # for the gating masks below)
                if dgs:
                    rt_o, rd_o, rt_n, rd_n = fetch_db_pair(oldd, newd)
                else:
                    rt_o, rd_o = fetch_db(oldj, oldd)
                    rt_n, rd_n = fetch_db(newj, newd)
                codeq, qs_d = fetch_q(rmap_v, sseid)
            else:
                # db-side rows for old and new: tableau AND distance
                # columns for BOTH in ONE stacked dot
                oh_o = li == oldd
                oh_n = li == newd
                ohb = jnp.concatenate([oh_o, oh_n], axis=1).astype(BF16)
                tabs, dmats = fetch_cols(ohb)  # [DQ, 2C] each
                rt_o = tabs[:, :C]
                rt_n = tabs[:, C:]
                rd_o = dmats[:, :C]
                rd_n = dmats[:, C:]

                # query-side values at (k, ssei), scattered to db rows;
                # code and distance packed into one gather accumulator
                m1f = m1.astype(BF16)
                qc2 = jnp.dot(g_q, m1f, preferred_element_type=F32)
                qs = gather_by_revmap(pack_qc(qc2[:NQH], qc2[NQH:]),
                                      rmap_v)
                codeq, qs_d = unpack_qc(qs)
            qhi = jnp.floor(codeq * 0.125)
            qlo = codeq - qhi * 8.0

            mb = (rmap_v >= 0) & (rmap_v != sseid)
            t_o = (mb & (oldd >= 0)
                   & (jnp.abs(qs_d - rd_o) <= p.mxssed))
            t_n = (mb & (newd >= 0)
                   & (jnp.abs(qs_d - rd_n) <= p.mxssed))
            tsc_o = unpack_tsc(rt_o, qhi, qlo)
            tsc_n = unpack_tsc(rt_n, qhi, qlo)
            delta = seg_sum_d(jnp.where(t_n, tsc_n, 0.0)
                              - jnp.where(t_o, tsc_o, 0.0))  # [G, C]
            delta_i = delta.astype(I32)

            newscore = score[...] + delta_i
            improved = newscore > maxscore[...]
            maxscore[...] = jnp.where(improved, newscore, maxscore[...])
            if lsoln:
                impq = rep_q(jnp.where(improved, 1, 0)) == 1
                moved = jnp.where(m1, rep_q(newj), smap_v)
                bestmap[...] = jnp.where(impq, moved, bestmap[...])

            # log-domain acceptance: the accept slot carries ln(u)
            # (supplied mode: engine.log_acc_slots at generation; pltpu
            # mode: log here) — pure arithmetic, so Mosaic and XLA
            # agree bitwise, unlike their exp lowerings
            lacc = u_acc if rng_mode == "supplied" else jnp.log(u_acc)
            accept = delta > temp * lacc  # [G, C]
            if "update" in knock:  # profiling stand-in
                score[...] = jnp.where(accept, newscore, score[...])
                return temp * p.alpha
            acci = jnp.where(accept, 1, 0)
            accq = rep_q(acci) == 1
            accd = rep_d(acci) == 1
            score[...] = jnp.where(accept, newscore, score[...])
            ssemap[...] = jnp.where(m1 & accq, rep_q(newj), smap_v)
            # li == oldd/newd is false wherever oldj/newj is -1 (li is
            # never negative), so no separate >= 0 guards are needed;
            # oldj and newj are never the same mapped SSE (newj is
            # unmatched by construction)
            rmap_new = jnp.where((li == oldd) & accd, -1, rmap_v)
            revmap[...] = jnp.where((li == newd) & accd, sseid, rmap_new)
            return temp * p.alpha

        # ``unroll``: annealing iterations inlined per loop step (the
        # iterations are data-dependent, so this only trims loop
        # overhead / enables instruction overlap, never reorders work;
        # manual unroll — Mosaic's fori_loop supports only 1 or full)
        if unroll > 1 and maxiter % unroll == 0:
            def iter_body_u(j, temp):
                for k in range(unroll):
                    temp = iter_body(j * unroll + k, temp)
                return temp

            lax.fori_loop(0, maxiter // unroll, iter_body_u,
                          jnp.full((), p.temp0, F32))
        else:
            lax.fori_loop(0, maxiter, iter_body,
                          jnp.full((), p.temp0, F32))

        # ---- final per-entry reduction over chains
        @pl.when(r == r_seq - 1)
        def _():
            act = lanes() < c_par
            ms = jnp.where(act, maxscore[...], NEG - 1)
            best = jnp.max(ms, axis=1, keepdims=True)  # [G, 1]
            outscore_ref[0] = jnp.broadcast_to(best, (G, C))
            if lsoln:
                winner = jnp.min(jnp.where(ms == best, lanes(), C),
                                 axis=1, keepdims=True)  # [G, 1]
                ohw = lanes() == winner  # [G, C]
                ohwq = rep_q(jnp.where(ohw, 1, 0))
                outbest_ref[0] = jnp.sum(
                    jnp.where(ohwq == 1, bestmap[...], 0), axis=1,
                    keepdims=True)

    # grid order (entry-group, query, restart): restarts innermost (the
    # maxscore accumulation), queries sweep against a resident entry
    # group (the bd tables built at q == 0 serve the whole q sweep)
    grid = (EG, nq, r_seq)
    out_shape = [jax.ShapeDtypeStruct((nq, EG, G, C), jnp.int32)]
    out_specs = [pl.BlockSpec((None, 1, G, C), lambda e, q, r: (q, e, 0, 0),
                              memory_space=pltpu.VMEM)]
    if lsoln:
        out_shape.append(jax.ShapeDtypeStruct((nq, EG, NQ, 1), jnp.int32))
        out_specs.append(pl.BlockSpec((None, 1, NQ, 1),
                                      lambda e, q, r: (q, e, 0, 0),
                                      memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((E,), lambda e, q, r: (0,),
                     memory_space=pltpu.SMEM),  # n2
        pl.BlockSpec((nq, n1r), lambda e, q, r: (0, 0),
                     memory_space=pltpu.SMEM),  # qtypes scalars
        # (whole-array SMEM block: Mosaic rejects squeezed SMEM blocks
        # whose trailing dim is neither 128-divisible nor full)
        # query matrices: scattered [NQH, NQ] bf16 for the MXU fetch
        # modes, lane-fused [8*planes, 128] f32 vectors for "dg"
        pl.BlockSpec((None, 8 * NPL, C) if dg else (None, NQH, NQ),
                     lambda e, q, r: (q, 0, 0),
                     memory_space=pltpu.VMEM),  # qb2t / qfc
        pl.BlockSpec((None, 8 * NPL, C) if dg else (None, NQH, NQ),
                     lambda e, q, r: (q, 0, 0),
                     memory_space=pltpu.VMEM),  # qb2d / qfd
        pl.BlockSpec((DQ, 1), lambda e, q, r: (e, 0),
                     memory_space=pltpu.VMEM),  # types2 flat [E*d2, 1]
        pl.BlockSpec((DQ, d2), lambda e, q, r: (e, 0),
                     memory_space=pltpu.VMEM),  # tab2p flat stacked
        pl.BlockSpec((DQ, d2), lambda e, q, r: (e, 0),
                     memory_space=pltpu.VMEM),  # dmat2 flat stacked
    ]
    if rng_mode == "pltpu":
        in_specs.append(pl.BlockSpec((2 + E,), lambda e, q, r: (0,),
                                     memory_space=pltpu.SMEM))
    else:
        in_specs.append(pl.BlockSpec((None, 1, 1, PG, C),
                                     lambda e, q, r: (q, e, r, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((nq,), lambda e, q, r: (0,),
                                 memory_space=pltpu.SMEM))  # tags
    in_specs.append(pl.BlockSpec((nq,), lambda e, q, r: (0,),
                                 memory_space=pltpu.SMEM))  # n1s
    scratch = [
        pltpu.VMEM((NQ, C), jnp.int32),  # ssemap
        pltpu.VMEM((DQ, C), jnp.int32),  # revmap
        pltpu.VMEM((G, C), jnp.int32),  # score
        pltpu.VMEM((G, C), jnp.int32),  # maxscore
    ]
    if lsoln:
        scratch.append(pltpu.VMEM((NQ, C), jnp.int32))  # bestmap
    if dgs:
        scratch.append(pltpu.VMEM((4 * DQ, C), jnp.float32))  # dbcd_s
        scratch.append(pltpu.VMEM((2 * DQ, C), jnp.float32))  # qfcd_s
    elif dgp:
        scratch.append(pltpu.VMEM((DQ, C), jnp.float32))  # dbp_s
        scratch.append(pltpu.VMEM((NPL * DQ, C), jnp.float32))  # qfp_s
    elif dg:
        scratch.append(pltpu.VMEM((DQ, C), jnp.float32))  # dbc_s
        scratch.append(pltpu.VMEM((DQ, C), jnp.float32))  # dbd_s
        scratch.append(pltpu.VMEM((NPL * DQ, C), jnp.float32))  # qfc_s
        scratch.append(pltpu.VMEM((NPL * DQ, C), jnp.float32))  # qfd_s
    else:
        if not kloop_unroll:
            scratch.append(pltpu.VMEM((NQH, C), jnp.float32))  # qc_s
        scratch.append(pltpu.VMEM((2 * DQ, BD), BF16))  # bd_all
    if cum == "mxu":
        scratch.append(pltpu.VMEM((BD, BD), BF16))  # tril ones
    call = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
    )

    def batched(n2, qts, qb2ts, qb2ds, t2, tp, dm, rng_in, tags,
                n1s=None):
        if n1s is None:
            n1s = jnp.full((nq,), n1, I32)
        out = call(n2, qts, qb2ts, qb2ds, t2, tp, dm, rng_in,
                   jnp.asarray(tags, I32), jnp.asarray(n1s, I32))
        if lsoln:
            return out
        (scores,) = out
        return scores, None

    batched.qrep = "qflat" if dg else "qb2"  # query-rep the caller
    # must build (make_qflat[_batched] vs make_qb2[_batched])
    if nq > 1 or batched_api:
        return batched, G

    def single(n2, qt, qb2t, qb2d, t2, tp, dm, rng_in, n1s=None):
        if rng_mode == "pltpu":
            tags = rng_in[1:2].astype(I32)
            rng = rng_in
        else:
            tags = jnp.zeros((1,), I32)
            rng = rng_in[None]
        s, m = batched(n2, qt[None], qb2t[None], qb2d[None],
                       t2, tp, dm, rng, tags, n1s)
        return s[0], (None if m is None else m[0])

    single.qrep = batched.qrep
    return single, G
