"""Pallas TPU kernel v2: entry-group sublane batching.

Same semantics as ops/pallas_sa.py (the v1 kernel, kept for reference
and cross-checking) but processes G database entries per grid step,
packing their SSE dimensions side by side in the sublane axis:

* v1 ops touch [d2, C] tiles (2 sublane rows of 8 for the dominant
  16-cap bucket) — per-op issue overhead dominates (~330 ns/entry/iter
  measured on v5e);
* v2 lays state out flat as [G*d2, C] / [G*n1r, C] with
  G = largest power of two with G*max(d2, n1r) <= 128, so every
  elementwise op fills a full 8x128-based tile column and the one-hot
  gathers become 128x128 block-diagonal MXU contractions.

Layout contracts:
* db-side flat index p = g*d2 + l (g = entry-in-group, l = db SSE);
* query-side flat index p = g*n1r + k;
* per-(entry, chain) scalars live as [G, C] tiles; broadcast into a
  segment via reshape-broadcast; segment reductions via [G, seg, C]
  reshape + axis-1 reduce;
* uniforms (supplied mode) are slot-major: row s*G + g = slot s of
  entry g, so a slot read is one contiguous [G, C] (or [3G, C]) slice;
* block-diagonal tables (db tableau/distance, query tableau/distance)
  are built once per grid step / kernel into VMEM scratch; the db and
  query pairs are stacked vertically so each gather direction costs a
  single MXU dot.

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
from .pallas_sa import round8

I32 = jnp.int32
F32 = jnp.float32
C_LANES = 128


def choose_group(d2: int, n1r: int, cap: int = 128) -> int:
    g = 1
    while 2 * g * max(d2, n1r) <= cap and 2 * g <= 16:
        g *= 2
    return g


@functools.lru_cache(maxsize=None)
def make_pallas2_bucket_search(E: int, n1: int, d2: int, c_par: int,
                               r_seq: int, lorder: bool,
                               params: SAParams = DEFAULTS,
                               interpret: bool = False,
                               rng_mode: str = "supplied"):
    """Build the grouped pallas_call for an E-entry chunk (G | E).

    Returns fn(n2_i32[E], qtypes_i32[n1r] (SMEM), qtabp_f32[n1r,n1r],
               qdmat_f32[n1r,n1r], types2_i32[E*d2, 1],
               tab2p_f32[E*d2, d2], dmat2_f32[E*d2, d2], rng_input)
         -> (scores_i32[E//G, G, C], bestmaps_i32[E//G, G*n1r, 1])

    rng_input: uniforms_f32[E//G, r_seq, P*G, C] (slot-major) for
    "supplied"; (seed, tag, indices[E]) int32[2+E] (SMEM) for "pltpu".
    """
    p = params
    maxiter = p.maxiter
    P = n1 + 3 * maxiter
    n1r = round8(n1)
    G = choose_group(d2, n1r)
    assert E % G == 0, (E, G)
    EG = E // G
    C = C_LANES
    NEG = p.maxscore_init
    BIG = n1 + d2 + 999
    DQ = G * d2  # db-side flat rows
    NQ = G * n1r  # query-side flat rows
    PG = P * G  # uniforms rows per restart (slot-major)
    PGpad = round8(PG)

    def iota_d():  # flat db-side iota
        return lax.broadcasted_iota(I32, (DQ, C), 0)

    def iota_q():
        return lax.broadcasted_iota(I32, (NQ, C), 0)

    def l_idx():
        return iota_d() % d2

    def g_idx_d():
        return iota_d() // d2

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

    def extract_q(state, k):
        """state [NQ, C], row k of each segment -> [G, C] (k static or
        traced scalar)."""
        return seg_sum_q(jnp.where(k_idx() == k, state, 0))

    def prefix_sum_seg(x):
        """Inclusive prefix sum within each d2 segment (masked rolls:
        p - s stays in-segment iff l_idx(p) >= s)."""
        li = l_idx()
        s = 1
        while s < d2:
            x = x + jnp.where(li >= s, pltpu.roll(x, s, 0), 0.0)
            s *= 2
        return x

    def unpack_tsc(packed, qhi, qlo):
        dhi = jnp.floor(packed / 8.0)
        dlo = packed - dhi * 8.0
        he = dhi == qhi
        le = dlo == qlo
        return jnp.where(he & le, 2.0, jnp.where(he | le, 1.0, -2.0))

    def kernel(n2_ref, qtypes_ref, qtypesv_ref, qtabp_ref, qdmat_ref,
               types2_ref, tab2p_ref, dmat2_ref, rng_ref,
               outscore_ref, outbest_ref,
               ssemap, revmap, score, maxscore, bestmap, uni,
               bd_db, bd_q):
        eg = pl.program_id(0)
        r = pl.program_id(1)

        # ---- per-entry order column [G, C]
        n2col = jnp.concatenate(
            [jnp.full((1, C), n2_ref[eg * G + g], I32) for g in range(G)],
            axis=0)

        # ---- block-diagonal stacked tables, built once per grid step:
        # bd_db [2*DQ, DQ] = [[BD(tab)], [BD(dmat)]]
        @pl.when(r == 0)
        def _():
            bd_db[...] = jnp.zeros((2 * DQ, DQ), F32)
            for g in range(G):
                sl_r = pl.ds(g * d2, d2)
                sl_c = pl.ds(g * d2, d2)
                bd_db[sl_r, sl_c] = tab2p_ref[pl.ds(g * d2, d2), :]
                bd_db[pl.ds(DQ + g * d2, d2), sl_c] = \
                    dmat2_ref[pl.ds(g * d2, d2), :]

        @pl.when((eg == 0) & (r == 0))
        def _():
            bd_q[...] = jnp.zeros((2 * NQ, NQ), F32)
            for g in range(G):
                sl_c = pl.ds(g * n1r, n1r)
                bd_q[pl.ds(g * n1r, n1r), sl_c] = qtabp_ref[...]
                bd_q[pl.ds(NQ + g * n1r, n1r), sl_c] = qdmat_ref[...]

        @pl.when(r == 0)
        def _():
            maxscore[...] = jnp.full((G, C), NEG, I32)
            bestmap[...] = jnp.full((NQ, C), -1, I32)

        if rng_mode == "pltpu":
            s1 = (rng_ref[0] * I32(-1640531527) + rng_ref[1] * I32(97))
            s2 = (rng_ref[2 + eg * G] * I32(2057) + r * I32(-1105766181))
            pltpu.prng_seed(s1, s2)
            bits = pltpu.prng_random_bits((PGpad, C))
            bits24 = pltpu.bitcast(
                jax.lax.shift_right_logical(
                    pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)),
                jnp.int32)
            uni[...] = bits24.astype(F32) * F32(2.0 ** -24)

        def read_u(slot, nrows):
            """rows [slot*G, slot*G + nrows*G) -> [nrows*G, C]."""
            if rng_mode == "pltpu":
                return uni[pl.ds(slot * G, nrows * G), :]
            return rng_ref[0, 0, pl.ds(slot * G, nrows * G), :]

        types2 = types2_ref[...]  # [DQ, 1]
        gather_db = bd_db[...]  # [2*DQ, DQ]
        gather_q = bd_q[...]  # [2*NQ, NQ]

        def rows_for(j):
            """j [G, C] db-SSE index per entry -> (tab_rows, dmat_rows)
            each [DQ, C] via one stacked block-diag MXU dot."""
            oh = (l_idx() == rep_d(j)).astype(F32)
            both = jnp.dot(gather_db, oh, preferred_element_type=F32)
            return both[:DQ, :], both[DQ:, :]

        def gather_maps(rows_list):
            """y_t[p, c] = rows[(g, l_{g,k})] for each rows in
            rows_list, sharing the per-k mask."""
            ys = [jnp.zeros((NQ, C), F32) for _ in rows_list]

            def body(k, ys):
                l_k = extract_q(ssemap[...], k)  # [G, C]
                m = l_idx() == rep_d(l_k)
                out = []
                for y, rows in zip(ys, rows_list):
                    srow = seg_sum_d(jnp.where(m, rows, 0.0))
                    out.append(y + jnp.where(k_idx() == k, rep_q(srow),
                                             0.0))
                return tuple(out)

            # Mosaic's fori lowering only supports full unroll or 1
            return lax.fori_loop(0, n1, body, tuple(ys),
                                 unroll=n1 if n1 <= 16 else 1)

        # ---- thinit (kernel.cu:588-648)
        ssemap[...] = jnp.full((NQ, C), -1, I32)
        revmap[...] = jnp.full((DQ, C), -1, I32)

        def thinit_body(i, carry):
            j, stopped = carry  # [G, C] each; stopped int32
            u_i = read_u(i, 1)  # [G, C]
            t1 = qtypes_ref[i]
            attempt = (u_i < p.init_matchprob) & (stopped == 0)
            cmask = ((l_idx() >= rep_d(j)) & (types2 == t1)
                     & (l_idx() < rep_d(n2col)))
            jfound = seg_min_d(jnp.where(cmask, l_idx(), BIG))  # [G, C]
            ok = attempt & (jfound < n2col)
            stopped = jnp.where(attempt & (jfound >= n2col), 1, stopped)
            okq = rep_q(jnp.where(ok, 1, 0)) == 1
            ssemap[...] = jnp.where((k_idx() == i) & okq, rep_q(jfound),
                                    ssemap[...])
            okd = rep_d(jnp.where(ok, 1, 0)) == 1
            revmap[...] = jnp.where(
                (l_idx() == rep_d(jfound)) & okd, i, revmap[...])
            return jnp.where(ok, jfound + 1, j), stopped

        lax.fori_loop(0, n1, thinit_body,
                      (jnp.zeros((G, C), I32), jnp.zeros((G, C), I32)))

        # ---- initial full score (kernel.cu:396-440)
        def initscore_body(i, acc):
            smap_v = ssemap[...]
            l_i = extract_q(smap_v, i)  # [G, C]
            rows_t, rows_d = rows_for(l_i)
            y_t, y_d = gather_maps([rows_t, rows_d])
            # query column i is shared across entries: one-hot over n1r
            oh_i = (k_idx() == i).astype(F32)
            qboth = jnp.dot(gather_q, oh_i, preferred_element_type=F32)
            qt_i = qboth[:NQ, :]
            qd_i = qboth[NQ:, :]
            qhi = jnp.floor(qt_i / 8.0)
            qlo = qt_i - qhi * 8.0
            use = ((k_idx() > i) & (smap_v >= 0) & (rep_q(l_i) >= 0)
                   & (jnp.abs(qd_i - y_d) <= p.mxssed))
            tsc = unpack_tsc(y_t, qhi, qlo)
            return acc + seg_sum_q(jnp.where(use, tsc, 0.0))

        score0 = lax.fori_loop(0, n1, initscore_body,
                               jnp.zeros((G, C), F32))
        score[...] = score0.astype(I32)

        improved0 = score[...] > maxscore[...]
        maxscore[...] = jnp.where(improved0, score[...], maxscore[...])
        bestmap[...] = jnp.where(rep_q(jnp.where(improved0, 1, 0)) == 1,
                                 ssemap[...], bestmap[...])

        # ---- annealing loop (kernel.cu:1032-1191)
        def iter_body(it, temp):
            smap_v = ssemap[...]
            rmap_v = revmap[...]
            u3 = read_u(n1 + 3 * it, 3)  # [3G, C]
            u_move = u3[0:G, :]
            u_cand = u3[G:2 * G, :]
            u_acc = u3[2 * G:3 * G, :]

            ssei = ((u_move - p.eps) * float(n1)).astype(I32)  # [G, C]
            sseiq = rep_q(ssei)
            m1 = k_idx() == sseiq  # [NQ, C]
            m1f = m1.astype(F32)

            qt = seg_sum_q(jnp.where(m1, qtypesv_ref[...], 0))  # [G, C]

            if lorder:
                km = jnp.where((k_idx() <= sseiq) & (smap_v >= 0),
                               k_idx(), -1)
                kbest = seg_max_q(km)  # [G, C]
                sj = seg_sum_q(jnp.where(k_idx() == rep_q(kbest),
                                         smap_v, 0))
                startj = jnp.where(kbest >= 0, sj, n2col)
                kn = jnp.where((k_idx() > sseiq) & (smap_v != -1),
                               k_idx(), BIG)
                knext = seg_min_q(kn)
                ej = seg_sum_q(jnp.where(k_idx() == rep_q(knext),
                                         smap_v, 0))
                endj = jnp.where(ssei == n1 - 1, n2col,
                                 jnp.where(knext < n1, ej, -1))
            else:
                startj = jnp.zeros((G, C), I32)
                endj = n2col

            cand = ((l_idx() >= rep_d(startj)) & (l_idx() < rep_d(endj))
                    & (types2 == rep_d(qt)) & (rmap_v < 0))
            candf = cand.astype(F32)
            count = seg_sum_d(candf)  # [G, C]
            rpick = ((u_cand - p.eps) * count).astype(I32)
            cum = prefix_sum_seg(candf).astype(I32)
            hit = cand & (cum == rep_d(rpick) + 1)
            newj = seg_max_d(jnp.where(hit, l_idx(), -1))  # [G, C]

            oldj = seg_sum_q(jnp.where(m1, smap_v, 0))  # [G, C]

            # rows for old and new in two stacked dots
            rt_o, rd_o = rows_for(oldj)
            rt_n, rd_n = rows_for(newj)
            rows_t = rt_o * 64.0 + rt_n
            y_t, y_do, y_dn = gather_maps([rows_t, rd_o, rd_n])
            y_to = jnp.floor(y_t / 64.0)
            y_tn = y_t - y_to * 64.0

            qboth = jnp.dot(gather_q, m1f, preferred_element_type=F32)
            qrow_t = qboth[:NQ, :]
            qrow_d = qboth[NQ:, :]
            qhi = jnp.floor(qrow_t / 8.0)
            qlo = qrow_t - qhi * 8.0

            oldq = rep_q(oldj)
            newq = rep_q(newj)
            mbase = (smap_v >= 0) & ~m1
            t_o = (mbase & (oldq >= 0) & (smap_v != oldq)
                   & (jnp.abs(qrow_d - y_do) <= p.mxssed))
            t_n = (mbase & (newq >= 0) & (smap_v != newq)
                   & (jnp.abs(qrow_d - y_dn) <= p.mxssed))
            tsc_o = unpack_tsc(y_to, qhi, qlo)
            tsc_n = unpack_tsc(y_tn, qhi, qlo)
            delta = seg_sum_q(jnp.where(t_n, tsc_n, 0.0)
                              - jnp.where(t_o, tsc_o, 0.0))  # [G, C] f32
            delta_i = delta.astype(I32)

            newscore = score[...] + delta_i
            improved = newscore > maxscore[...]
            impq = rep_q(jnp.where(improved, 1, 0)) == 1
            moved = jnp.where(m1, newq, smap_v)
            maxscore[...] = jnp.where(improved, newscore, maxscore[...])
            bestmap[...] = jnp.where(impq, moved, bestmap[...])

            accept = jnp.exp(delta / temp) > u_acc  # [G, C]
            accq = rep_q(jnp.where(accept, 1, 0)) == 1
            accd = rep_d(jnp.where(accept, 1, 0)) == 1
            score[...] = jnp.where(accept, newscore, score[...])
            ssemap[...] = jnp.where(m1 & accq, newq, smap_v)
            oldd = rep_d(oldj)
            newd = rep_d(newj)
            rmap_new = jnp.where((l_idx() == oldd) & accd & (oldd >= 0),
                                 -1, rmap_v)
            revmap[...] = jnp.where((l_idx() == newd) & accd
                                    & (newd >= 0), rep_d(ssei), rmap_new)
            return temp * p.alpha

        lax.fori_loop(0, maxiter, iter_body, jnp.full((), p.temp0, F32))

        # ---- final per-entry reduction over chains
        @pl.when(r == r_seq - 1)
        def _():
            act = lanes() < c_par
            ms = jnp.where(act, maxscore[...], NEG - 1)
            best = jnp.max(ms, axis=1, keepdims=True)  # [G, 1]
            winner = jnp.min(jnp.where(ms == best, lanes(), C), axis=1,
                             keepdims=True)  # [G, 1]
            ohw = lanes() == winner  # [G, C]
            outscore_ref[0] = jnp.broadcast_to(best, (G, C))
            ohwq = rep_q(jnp.where(ohw, 1, 0))
            outbest_ref[0] = jnp.sum(
                jnp.where(ohwq == 1, bestmap[...], 0), axis=1,
                keepdims=True)

    grid = (EG, r_seq)
    out_shape = (
        jax.ShapeDtypeStruct((EG, G, C), jnp.int32),
        jax.ShapeDtypeStruct((EG, NQ, 1), jnp.int32),
    )
    in_specs = [
        pl.BlockSpec((E,), lambda e, r: (0,),
                     memory_space=pltpu.SMEM),  # n2
        pl.BlockSpec((n1r,), lambda e, r: (0,),
                     memory_space=pltpu.SMEM),  # qtypes scalars
        pl.BlockSpec((NQ, 1), lambda e, r: (0, 0),
                     memory_space=pltpu.VMEM),  # qtypes tiled vector
        pl.BlockSpec((n1r, n1r), lambda e, r: (0, 0),
                     memory_space=pltpu.VMEM),  # qtabp
        pl.BlockSpec((n1r, n1r), lambda e, r: (0, 0),
                     memory_space=pltpu.VMEM),  # qdmat
        pl.BlockSpec((DQ, 1), lambda e, r: (e, 0),
                     memory_space=pltpu.VMEM),  # types2 flat [E*d2, 1]
        pl.BlockSpec((DQ, d2), lambda e, r: (e, 0),
                     memory_space=pltpu.VMEM),  # tab2p flat stacked
        pl.BlockSpec((DQ, d2), lambda e, r: (e, 0),
                     memory_space=pltpu.VMEM),  # dmat2 flat stacked
    ]
    if rng_mode == "pltpu":
        in_specs.append(pl.BlockSpec((2 + E,), lambda e, r: (0,),
                                     memory_space=pltpu.SMEM))
    else:
        in_specs.append(pl.BlockSpec((1, 1, PG, C),
                                     lambda e, r: (e, r, 0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = (
        pl.BlockSpec((1, G, C), lambda e, r: (e, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NQ, 1), lambda e, r: (e, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    scratch = [
        pltpu.VMEM((NQ, C), jnp.int32),  # ssemap
        pltpu.VMEM((DQ, C), jnp.int32),  # revmap
        pltpu.VMEM((G, C), jnp.int32),  # score
        pltpu.VMEM((G, C), jnp.int32),  # maxscore
        pltpu.VMEM((NQ, C), jnp.int32),  # bestmap
        pltpu.VMEM((PGpad, C), jnp.float32),  # uni
        pltpu.VMEM((2 * DQ, DQ), jnp.float32),  # bd_db
        pltpu.VMEM((2 * NQ, NQ), jnp.float32),  # bd_q
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    ), G
