"""Pallas TPU kernel for the simulated-annealing tableau search.

This is the hand-fused fast path of the engine in ops/engine.py: the
same move/score/acceptance semantics as the reference CUDA kernel
(/root/reference/nvcc_src_current/cudaSaTabsearch_kernel.cu:806-1236)
and the same fixed per-restart uniform slot schedule as the golden model
(ops/golden.py), so all three implementations are comparable chain by
chain.

Design (TPU-first, not a translation):

* One grid step = one (db entry, restart block).  The grid is
  ``(E, R)`` with R innermost, so the per-entry VMEM state (running
  max score / best map across restarts) persists across the R sweep
  of an entry -- the Pallas analog of the reference's per-thread
  restart loop carrying ``maxscore``.  Entry inputs (tableau, distance
  matrix, uniforms) are streamed HBM->VMEM by the Pallas pipeline.
* 128 SA chains run in the VPU lane dimension; SSE dimensions occupy
  sublanes.  All data-dependent scans of the reference (candidate list
  build, LORDER window walk, O(n1) delta loop) are masked lane-parallel
  reductions -- divergence-free by construction.
* The per-chain irregular "gather by mapping" (x[k] = table[j_c, l_k])
  runs in two stages: a one-hot MXU contraction for the table row at j
  (table @ onehot(j), exact for our small-int-valued f32 data), then a
  masked sublane reduction over the mapping for each query SSE.
* Tableau codes travel packed (hi*8 + lo, < 40, exact in f32) so one
  gather serves both halves of the pair score; the old and new rows are
  additionally packed into one value (old*64 + new), halving gather
  work in the hot loop.
* The inclusive prefix sum for "pick the r-th candidate" uses log2(d2)
  masked `pltpu.roll` steps.
* Randomness is supplied as a precomputed uniforms block per
  (entry, restart) following the golden model's slot schedule: slot i
  for thinit of query SSE i, slots n1 + 3*it + {0,1,2} for iteration
  it.  This costs one HBM stream (P*C floats per entry-restart) and
  buys bitwise testability against golden/engine; an in-kernel
  `pltpu.prng_*` mode can remove it later.

Whole state fits VMEM comfortably: worst case (n1r=112, d2=112, C=128)
is ~1.5 MB of ~16 MB/core.
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
from .engine import log_acc_slots

I32 = jnp.int32
F32 = jnp.float32
C_LANES = 128  # chains per pass: the VPU lane width


def round8(x: int) -> int:
    return max(8, -(-x // 8) * 8)


@functools.lru_cache(maxsize=None)
def make_pallas_bucket_search(E: int, n1: int, d2: int, c_par: int,
                              r_seq: int, lorder: bool,
                              params: SAParams = DEFAULTS,
                              interpret: bool = False,
                              use_cumsum: bool = False,
                              rng_mode: str = "supplied",
                              _ablate: str = ""):
    # rng_mode: "supplied" consumes a precomputed uniforms input
    # (bitwise-testable against golden/engine); "pltpu" generates the
    # same slot-scheduled block in-kernel with the TPU hardware PRNG
    # (pltpu.prng_*) seeded per (seed, query, entry, restart) — no HBM
    # uniforms stream, much smaller XLA graph, different (but equally
    # valid) stream: the reference's own CPU/GPU paths differ the same
    # way (README_example_usage.txt:43-49 vs :92-98).
    # _ablate: internal perf-bisection switch ('nodot', 'nogather',
    # 'noexp', 'noiter'); produces WRONG results, timing use only.
    """Build the pallas_call for an E-entry bucket chunk.

    Returns fn(n2_i32[E], qtypes_i32[n1r], qtypesv_f32[n1r,1],
               qtabp_f32[n1r,n1r], qdmat_f32[n1r,n1r],
               types2_i32[E,d2,1], tab2p_f32[E,d2,d2],
               dmat2_f32[E,d2,d2], uniforms_f32[E, r_seq, P, C])
         -> (scores_i32[E,1,C] (winner score broadcast over lanes),
             bestmaps_i32[E, n1r, 1])

    P = n1 + 3*maxiter, C = 128 lanes.  Chains c_par..127 still run but
    are masked out of the final reduction, so any c_par <= 128 gives
    exactly c_par*r_seq effective restarts.
    """
    assert 1 <= c_par <= C_LANES
    p = params
    maxiter = p.maxiter
    P = n1 + 3 * maxiter
    n1r = round8(n1)
    C = C_LANES
    NEG = p.maxscore_init  # -99999 (kernel.cu:1009)
    BIG = n1 + d2 + 999

    def _iota1():
        return lax.broadcasted_iota(I32, (n1r, C), 0)  # query-SSE index

    def _iota2():
        return lax.broadcasted_iota(I32, (d2, C), 0)  # db-SSE index

    def _lanes():
        return lax.broadcasted_iota(I32, (1, C), 1)  # chain index

    def gather_rows(table, j):
        """rows[l, c] = table[j_c, l] via one-hot MXU contraction.

        table is symmetric so table @ onehot(j) == the j-th rows.
        j == -1 yields an all-zero column (use sites mask on j >= 0).
        """
        oh = (_iota2() == j).astype(F32)  # [d2, C]
        if _ablate == "nodot":
            return oh * 2.0
        return jnp.dot(table, oh, preferred_element_type=F32)

    def gather_map(rows, smap_ref):
        """y[k, c] = rows[smap[k,c], c]; 0 where smap out of range.

        Reads the mapping row from the ssemap ref (compiled Mosaic has
        no dynamic_slice on values) and scatters the reduced row back
        with a masked broadcast add.
        """
        def body(k, y):
            l_k = smap_ref[pl.ds(k, 1), :]  # [1, C]
            sel = jnp.where(_iota2() == l_k, rows, 0.0)
            srow = jnp.sum(sel, axis=0, keepdims=True)
            return y + jnp.where(_iota1() == k, srow, 0.0)

        y0 = jnp.zeros((n1r, C), F32)
        if _ablate == "nogather":
            return y0 + rows[0:1, :]
        return lax.fori_loop(0, n1, body, y0, unroll=min(n1, 8))

    def prefix_sum(x):
        """Inclusive prefix sum along sublanes.

        Hillis-Steele with masked rolls (log2(d2) steps); the jnp.cumsum
        lowering on TPU serializes over sublanes.
        """
        if use_cumsum:
            return jnp.cumsum(x, axis=0)
        s = 1
        while s < d2:
            x = x + jnp.where(_iota2() >= s, pltpu.roll(x, s, 0), 0.0)
            s *= 2
        return x

    def unpack_tsc(packed, qhi, qlo):
        """Pair score from packed db code (hi*8+lo) vs query planes:
        +2 both halves equal / +1 one / -2 (kernel.cu:306-332)."""
        dhi = jnp.floor(packed / 8.0)
        dlo = packed - dhi * 8.0
        he = dhi == qhi
        le = dlo == qlo
        return jnp.where(he & le, 2.0, jnp.where(he | le, 1.0, -2.0))

    Ppad = round8(P)

    def kernel(n2_ref, qtypes_ref, qtypesv_ref, qtabp_ref, qdmat_ref,
               types2_ref, tab2p_ref, dmat2_ref, uniforms_ref,
               outscore_ref, outbest_ref,
               ssemap, revmap, score, maxscore, bestmap, uni):
        e = pl.program_id(0)
        r = pl.program_id(1)
        n2 = n2_ref[e]

        if rng_mode == "pltpu":
            # uniforms_ref here is (seed, tag, indices) packed in SMEM.
            # The hardware PRNG seeds from at most 2 words: mix
            # (seed, tag) and (entry index, restart) with odd constants
            # (Knuth multiplicative hashing; wrapping i32 mul).
            s1 = (uniforms_ref[0] * I32(-1640531527)
                  + uniforms_ref[1] * I32(97))
            s2 = (uniforms_ref[2 + e] * I32(2057) + r * I32(-1105766181))
            pltpu.prng_seed(s1, s2)
            bits = pltpu.prng_random_bits((Ppad, C))
            # uint32 -> f32 cast is not Mosaic-expressible: shift to 24
            # significant bits, reinterpret as (positive) int32, cast.
            bits24 = pltpu.bitcast(
                jax.lax.shift_right_logical(
                    pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)),
                jnp.int32)
            uni[...] = bits24.astype(F32) * F32(2.0 ** -24)

        def read_u(lo, size):
            if rng_mode == "pltpu":
                return uni[pl.ds(lo, size), :]
            return uniforms_ref[0, 0, pl.ds(lo, size), :]
        types2 = types2_ref[0]  # [d2, 1]
        qtabp = qtabp_ref[...]
        qdmat = qdmat_ref[...]
        tab2p = tab2p_ref[0]  # [d2, d2]
        dmat2 = dmat2_ref[0]

        @pl.when(r == 0)
        def _():
            maxscore[...] = jnp.full((1, C), NEG, I32)
            bestmap[...] = jnp.full((n1r, C), -1, I32)

        # ---- thinit: greedy random initial matching (kernel.cu:588-648)
        ssemap[...] = jnp.full((n1r, C), -1, I32)
        revmap[...] = jnp.full((d2, C), -1, I32)

        def thinit_body(i, carry):
            j, stopped = carry  # stopped: int32 0/1 (Mosaic scf.for
            # cannot carry i1 vectors)
            u_i = read_u(i, 1)  # [1, C]
            t1 = qtypes_ref[i]
            attempt = (u_i < p.init_matchprob) & (stopped == 0)
            cmask = (_iota2() >= j) & (types2 == t1) & (_iota2() < n2)
            jfound = jnp.min(jnp.where(cmask, _iota2(), BIG), axis=0,
                             keepdims=True)  # [1, C]
            ok = attempt & (jfound < n2)
            stopped = jnp.where(attempt & (jfound >= n2), 1, stopped)
            row = ssemap[pl.ds(i, 1), :]
            ssemap[pl.ds(i, 1), :] = jnp.where(ok, jfound, row)
            revmap[...] = jnp.where((_iota2() == jfound) & ok, i, revmap[...])
            return jnp.where(ok, jfound + 1, j), stopped

        lax.fori_loop(0, n1, thinit_body,
                      (jnp.zeros((1, C), I32), jnp.zeros((1, C), I32)))

        # ---- full O(n1^2) initial score (kernel.cu:396-440)
        def initscore_body(i, acc):
            smap_v = ssemap[...]
            l_i = ssemap[pl.ds(i, 1), :]  # [1, C]
            rows_t = gather_rows(tab2p, l_i)
            rows_d = gather_rows(dmat2, l_i)
            y_t = gather_map(rows_t, ssemap)
            y_d = gather_map(rows_d, ssemap)
            # column i of the query tables via one-hot MXU contraction
            # (dynamic lane-dim slicing is not Mosaic-expressible)
            oh_i = (_iota1() == i).astype(F32)  # [n1r, C], equal lanes
            qt_i = jnp.dot(qtabp, oh_i, preferred_element_type=F32)
            qd_i = jnp.dot(qdmat, oh_i, preferred_element_type=F32)
            qhi = jnp.floor(qt_i / 8.0)
            qlo = qt_i - qhi * 8.0
            use = ((_iota1() > i) & (smap_v >= 0) & (l_i >= 0)
                   & (jnp.abs(qd_i - y_d) <= p.mxssed))
            tsc = unpack_tsc(y_t, qhi, qlo)
            return acc + jnp.sum(jnp.where(use, tsc, 0.0), axis=0,
                                 keepdims=True)

        score0 = lax.fori_loop(0, n1, initscore_body, jnp.zeros((1, C), F32))
        score[...] = score0.astype(I32)

        improved0 = score[...] > maxscore[...]
        maxscore[...] = jnp.where(improved0, score[...], maxscore[...])
        bestmap[...] = jnp.where(improved0, ssemap[...], bestmap[...])

        # ---- the annealing loop (kernel.cu:1032-1191)
        def iter_body(it, temp):
            smap_v = ssemap[...]
            rmap_v = revmap[...]
            u3 = read_u(n1 + 3 * it, 3)  # [3, C]
            u_move = u3[0:1, :]
            u_cand = u3[1:2, :]
            u_acc = u3[2:3, :]

            ssei = ((u_move - p.eps) * float(n1)).astype(I32)  # [1, C]
            m1 = _iota1() == ssei  # one-hot over query SSEs [n1r, C]
            m1f = m1.astype(F32)

            qt = jnp.sum(jnp.where(m1, qtypesv_ref[...], 0.0), axis=0,
                         keepdims=True).astype(I32)  # [1, C]

            # ---- candidate window (kernel.cu:1053-1083)
            if lorder:
                km = jnp.where((_iota1() <= ssei) & (smap_v >= 0), _iota1(), -1)
                kbest = jnp.max(km, axis=0, keepdims=True)  # [1, C]
                sj = jnp.sum(jnp.where(_iota1() == kbest, smap_v, 0), axis=0,
                             keepdims=True)
                startj = jnp.where(kbest >= 0, sj, n2)
                kn = jnp.where((_iota1() > ssei) & (smap_v != -1), _iota1(), BIG)
                knext = jnp.min(kn, axis=0, keepdims=True)
                ej = jnp.sum(jnp.where(_iota1() == knext, smap_v, 0), axis=0,
                             keepdims=True)
                endj = jnp.where(ssei == n1 - 1, n2,
                                 jnp.where(knext < n1, ej, -1))
            else:
                startj = jnp.zeros((1, C), I32)
                endj = jnp.broadcast_to(n2, (1, C)).astype(I32)

            # ---- uniform same-type unmatched pick (kernel.cu:677-714)
            cand = ((_iota2() >= startj) & (_iota2() < endj)
                    & (types2 == qt) & (rmap_v < 0))
            candf = cand.astype(F32)
            count = jnp.sum(candf, axis=0, keepdims=True)
            rpick = ((u_cand - p.eps) * count).astype(I32)
            cum = prefix_sum(candf).astype(I32)
            hit = cand & (cum == rpick + 1)
            newj = jnp.max(jnp.where(hit, _iota2(), -1), axis=0,
                           keepdims=True)  # [1, C]; -1 = unmap

            oldj = jnp.sum(jnp.where(m1, smap_v, 0), axis=0,
                           keepdims=True)  # = ssemap[ssei] (may be -1)

            # ---- O(n1) incremental delta (kernel.cu:502-535)
            rows_t = (gather_rows(tab2p, oldj) * 64.0
                      + gather_rows(tab2p, newj))
            rows_do = gather_rows(dmat2, oldj)
            rows_dn = gather_rows(dmat2, newj)
            y_t = gather_map(rows_t, ssemap)
            y_to = jnp.floor(y_t / 64.0)
            y_tn = y_t - y_to * 64.0
            y_do = gather_map(rows_do, ssemap)
            y_dn = gather_map(rows_dn, ssemap)

            # query row ssei via one-hot MXU contraction (symmetric)
            qrow_t = jnp.dot(qtabp, m1f, preferred_element_type=F32)
            qrow_d = jnp.dot(qdmat, m1f, preferred_element_type=F32)
            qhi = jnp.floor(qrow_t / 8.0)
            qlo = qrow_t - qhi * 8.0

            mbase = (smap_v >= 0) & ~m1
            t_o = (mbase & (oldj >= 0) & (smap_v != oldj)
                   & (jnp.abs(qrow_d - y_do) <= p.mxssed))
            t_n = (mbase & (newj >= 0) & (smap_v != newj)
                   & (jnp.abs(qrow_d - y_dn) <= p.mxssed))
            tsc_o = unpack_tsc(y_to, qhi, qlo)
            tsc_n = unpack_tsc(y_tn, qhi, qlo)
            delta = jnp.sum(jnp.where(t_n, tsc_n, 0.0)
                            - jnp.where(t_o, tsc_o, 0.0),
                            axis=0, keepdims=True)  # [1, C] f32
            delta_i = delta.astype(I32)

            # ---- max tracking before acceptance (kernel.cu:1136-1155)
            newscore = score[...] + delta_i
            improved = newscore > maxscore[...]
            moved = jnp.where(m1, newj, smap_v)
            maxscore[...] = jnp.where(improved, newscore, maxscore[...])
            bestmap[...] = jnp.where(improved, moved, bestmap[...])

            # ---- Metropolis acceptance (kernel.cu:1166-1187) in the
            # log domain: the accept slot carries ln(u) (supplied mode:
            # engine.log_acc_slots; pltpu mode: log applied in-kernel),
            # so the test is backend-bitwise-stable arithmetic.
            if _ablate == "noexp":
                accept = delta / temp > u_acc
            else:
                lacc = u_acc if rng_mode == "supplied" else jnp.log(u_acc)
                accept = delta > temp * lacc  # [1, C]
            score[...] = jnp.where(accept, newscore, score[...])
            ssemap[...] = jnp.where(m1 & accept, newj, smap_v)
            rmap_new = jnp.where((_iota2() == oldj) & accept & (oldj >= 0),
                                 -1, rmap_v)
            revmap[...] = jnp.where((_iota2() == newj) & accept & (newj >= 0),
                                    ssei, rmap_new)
            return temp * p.alpha

        lax.fori_loop(0, 1 if _ablate == "noiter" else maxiter, iter_body,
                      jnp.full((), p.temp0, F32))

        # ---- final reduction over chains (kernel.cu:1194-1233):
        # first maximal active lane wins, like the reference's serial scan
        @pl.when(r == r_seq - 1)
        def _():
            act = _lanes() < c_par
            ms = jnp.where(act, maxscore[...], NEG - 1)
            best = jnp.max(ms)
            winner = jnp.min(jnp.where(ms == best, _lanes(), C))
            ohw = _lanes() == winner  # [1, C]
            outscore_ref[0] = jnp.full((1, C), best, I32)
            outbest_ref[0, :, :] = jnp.sum(
                jnp.where(ohw, bestmap[...], 0), axis=1, keepdims=True)

    grid = (E, r_seq)
    out_shape = (
        jax.ShapeDtypeStruct((E, 1, C), jnp.int32),
        jax.ShapeDtypeStruct((E, n1r, 1), jnp.int32),
    )
    in_specs = [
        pl.BlockSpec((E,), lambda e, r: (0,),
                     memory_space=pltpu.SMEM),  # n2 [E], whole array
        pl.BlockSpec((n1r,), lambda e, r: (0,),
                     memory_space=pltpu.SMEM),  # qtypes scalar access
        pl.BlockSpec((n1r, 1), lambda e, r: (0, 0),
                     memory_space=pltpu.VMEM),  # qtypes vector access
        pl.BlockSpec((n1r, n1r), lambda e, r: (0, 0),
                     memory_space=pltpu.VMEM),  # qtabp
        pl.BlockSpec((n1r, n1r), lambda e, r: (0, 0),
                     memory_space=pltpu.VMEM),  # qdmat
        pl.BlockSpec((1, d2, 1), lambda e, r: (e, 0, 0),
                     memory_space=pltpu.VMEM),  # types2
        pl.BlockSpec((1, d2, d2), lambda e, r: (e, 0, 0),
                     memory_space=pltpu.VMEM),  # tab2p
        pl.BlockSpec((1, d2, d2), lambda e, r: (e, 0, 0),
                     memory_space=pltpu.VMEM),  # dmat2
    ]
    if rng_mode == "pltpu":
        # (seed, tag, indices[E]) packed into one SMEM vector
        in_specs.append(pl.BlockSpec((2 + E,), lambda e, r: (0,),
                                     memory_space=pltpu.SMEM))
    else:
        in_specs.append(pl.BlockSpec((1, 1, P, C),
                                     lambda e, r: (e, r, 0, 0),
                                     memory_space=pltpu.VMEM))  # uniforms
    out_specs = (
        pl.BlockSpec((1, 1, C), lambda e, r: (e, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n1r, 1), lambda e, r: (e, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    scratch = [
        pltpu.VMEM((n1r, C), jnp.int32),  # ssemap
        pltpu.VMEM((d2, C), jnp.int32),  # revmap
        pltpu.VMEM((1, C), jnp.int32),  # score
        pltpu.VMEM((1, C), jnp.int32),  # maxscore
        pltpu.VMEM((n1r, C), jnp.int32),  # bestmap
        pltpu.VMEM((Ppad, C), jnp.float32),  # uni (pltpu rng mode)
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )


def pack_tab(tabhi: np.ndarray, tablo: np.ndarray) -> np.ndarray:
    """Pack hi/lo tableau planes into hi*8 + lo as float32."""
    return (tabhi.astype(np.float32) * 8.0
            + tablo.astype(np.float32)).astype(np.float32)


def prepare_query(query, n1r: int):
    """(qtypes_i32[n1r], qtypesv_f32[n1r,1], qtabp_f32, qdmat_f32)
    padded to n1r; padded type rows get an impossible type."""
    from ..core.codes import TYPE_PAD

    n1 = query.order
    qtypes = np.full((n1r,), TYPE_PAD, np.int32)
    qtypes[:n1] = query.types
    qtabp = np.zeros((n1r, n1r), np.float32)
    qtabp[:n1, :n1] = pack_tab(query.tabhi, query.tablo)
    qdmat = np.zeros((n1r, n1r), np.float32)
    qdmat[:n1, :n1] = query.dmat
    return (qtypes, qtypes.astype(np.float32)[:, None], qtabp, qdmat)


@functools.lru_cache(maxsize=None)
def _make_uniforms_jit(r_seq: int, P: int, c_par: int,
                       n1: int | None = None):
    if n1 is None:
        n1 = P - 3 * DEFAULTS.maxiter  # slot schedule: P = n1 + 3*maxiter
    def gen(keys):
        def per_entry(key):
            def per_restart(r):
                u = jax.random.uniform(jax.random.fold_in(key, r),
                                       (P, c_par), dtype=jnp.float32)
                u = log_acc_slots(u, n1)  # accept slots -> ln(u)
                if c_par < C_LANES:
                    u = jnp.pad(u, ((0, 0), (0, C_LANES - c_par)))
                return u
            return jax.vmap(per_restart)(jnp.arange(r_seq, dtype=jnp.uint32))

        return jax.vmap(per_entry)(keys)

    return jax.jit(gen)


def make_uniforms(keys, r_seq: int, P: int, c_par: int = C_LANES):
    """uniforms[e, r, :, :c_par] = uniform(fold_in(keys[e], r),
    (P, c_par)) — exactly the engine's per-restart stream
    (ops/engine.py restart_body), so kernel, engine, and golden model
    consume identical randomness for any chain count.  Lanes beyond
    c_par are zero-padded; the kernel masks those chains out.

    The Metropolis-acceptance slots carry ln(u), not u (see
    engine.log_acc_slots).

    jitted and cached per shape: an eager nested vmap would RETRACE on
    every call (~100 ms of pure Python per search chunk)."""
    return _make_uniforms_jit(r_seq, P, c_par)(keys)
