"""Search session: a resident packed+uploaded DB and a query stream.

The TPU analog of the reference driver's lifecycle (cudaSaTabsearch.cu
main, :573-1340): load DB once, copy it to the device once, then run any
number of queries against it, each costing only a tiny query upload plus
the kernel.  Used by the CLI (both stdin and query-list modes), the
benchmark runner, and the eval harness.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass


from .core.constants import DEFAULT_MAXSTART, SAParams, DEFAULTS, MAXDIM
from .io.pack import (DEFAULT_BUCKETS, PackedDB, PackedQuery, pack_database,
                      pack_query)
from .io.parser import TableauEntry, read_database
from .ops.search import SearchResult, search_db, upload_db
from .stats.gumbel import score_stats


@dataclass
class SessionConfig:
    maxstart: int = DEFAULT_MAXSTART
    seed: int = 1234
    gather_mode: str = "auto"
    c_max: int = 128
    buckets: tuple = DEFAULT_BUCKETS
    maxdim: int = MAXDIM
    params: SAParams = DEFAULTS
    backend: str = "auto"  # "pallas" | "xla" | "auto"
    use_mesh: bool = False  # shard the entry axis over all devices
    compat_z: bool = False  # reproduce the reference's int-truncated z
    devices: object = None  # optional explicit device list for the mesh
    chunk_entries: int = 0  # entries per pallas kernel dispatch
    # (0 = the pallas_search.CHUNK_ENTRIES default)


class SearchSession:
    def __init__(self, dbfile: str, config: SessionConfig | None = None,
                 entries: list[TableauEntry] | None = None):
        from .core.cache import enable_compile_cache
        from .core.warmup import warm_backend

        enable_compile_cache()  # persist compiled kernels across runs
        self.config = config or SessionConfig()
        self.dbfile = dbfile

        self.sharding = None
        pad_to = 1
        if self.config.use_mesh:
            from .parallel.mesh import entry_sharding, make_mesh

            mesh = make_mesh(self.config.devices)
            self.sharding = entry_sharding(mesh)
            pad_to = mesh.size

        t0 = time.perf_counter()
        self.db: PackedDB
        if entries is not None:
            self.db = pack_database(entries, self.config.buckets,
                                    pad_to=pad_to)
        else:
            from .io import native

            if native.available():
                # C++ parse+pack (native/satab_io.cpp), ~10x the Python
                # parser on large DBs
                self.db = native.pack_database_file(
                    dbfile, self.config.buckets,
                    maxdim=self.config.maxdim, pad_to=pad_to)
            else:
                self.db = pack_database(
                    read_database(dbfile, maxdim=self.config.maxdim),
                    self.config.buckets, pad_to=pad_to)
        self.load_ms = (time.perf_counter() - t0) * 1000.0

        # absorb the per-process remote-compile session init with a
        # one-op kernel so the real search programs compile at their
        # normal ~1-5 s cost (core/warmup.py; no-op on CPU/local TPU).
        # AFTER the DB load: a missing/corrupt dbfile must fail fast,
        # not after a ~2 min device warm-up.
        self.warmup_s = warm_backend()

        t0 = time.perf_counter()
        self.device_db = upload_db(self.db, sharding=self.sharding,
                                   backend=self.config.backend,
                                   chunk_entries=self.config.chunk_entries)
        self.upload_ms = (time.perf_counter() - t0) * 1000.0
        self._query_tag = 0

    @property
    def nentries(self) -> int:
        return self.db.nentries

    def resolve_query(self, name: str) -> PackedQuery | None:
        """Resolve a query by identifier from the resident DB (query-list
        mode, cudaSaTabsearch.cu:730-788)."""
        loc = self.db.lookup(name)
        if loc is None:
            return None
        return pack_query(self.db.entry(*loc))

    def search_many(self, queries, *, lorder: bool = True,
                    lsoln: bool = False) -> list[SearchResult]:
        """Pipelined multi-query search (Pallas backend): dispatch all
        queries asynchronously, drain once.  Sustains device throughput
        when per-dispatch host latency is significant (remote tunnels,
        many small queries).  Falls back to sequential search elsewhere.
        """
        from .ops.search import resolve_backend

        cfg = self.config
        if resolve_backend(cfg.backend, self.sharding) != "pallas":
            return [self.search(q, lorder=lorder, lsoln=lsoln)
                    for q in queries]
        from .ops.pallas_search import (assemble_db_pallas2_multi,
                                        dispatch_db_pallas2_multi)

        # group queries by round8(SSE count) — the kernel is
        # specialized per 8-padded order bucket and takes exact orders
        # at runtime, so real mixed-order streams (multiquery.input,
        # query lists) batch into a handful of device programs; each
        # group is ONE device program + ONE drain
        from .ops.common import round8

        order_groups: dict[int, list[int]] = {}
        for i, q in enumerate(queries):
            order_groups.setdefault(round8(q.order), []).append(i)

        handles = []
        for order, idxs in order_groups.items():
            tags = []
            for _ in idxs:
                tags.append(self._query_tag)
                self._query_tag += 1
            handles.append((idxs, dispatch_db_pallas2_multi(
                [queries[i] for i in idxs], self.db,
                maxstart=cfg.maxstart, lorder=lorder, seed=cfg.seed,
                query_tags=tags, c_max=cfg.c_max, params=cfg.params,
                device_db=self.device_db, lsoln=lsoln,
                mesh=self.sharding.mesh if self.sharding is not None
                else None)))
        out: list = [None] * len(queries)
        for idxs, h in handles:
            for i, (scores, maps) in zip(idxs,
                                         assemble_db_pallas2_multi(h)):
                out[i] = SearchResult(
                    scores=scores, ssemaps=maps, names=self.db.names,
                    orders=self.db.orders, query_order=queries[i].order,
                    maxstart=cfg.maxstart)
        return out

    def search(self, query: PackedQuery, *, lorder: bool = True,
               query_tag: int | None = None,
               lsoln: bool = True) -> SearchResult:
        cfg = self.config
        if query_tag is None:
            query_tag = self._query_tag
        self._query_tag = query_tag + 1
        return search_db(query, self.db, maxstart=cfg.maxstart,
                         lorder=lorder, seed=cfg.seed, query_tag=query_tag,
                         c_max=cfg.c_max, gather_mode=cfg.gather_mode,
                         params=cfg.params, device_db=self.device_db,
                         sharding=self.sharding, backend=cfg.backend,
                         lsoln=lsoln)


def format_results(result: SearchResult, qn: int, *, lsoln: bool,
                   compat_z: bool = False, out=None) -> None:
    """Emit result lines ``name rawscore norm2 z p`` (+ 1-based ssemap
    pair lines under LSOLN), byte-compatible with the reference's
    ``%-8s %d %g %g %g`` / ``%3d %3d`` (cudaSaTabsearch.cu:1102-1114)."""
    out = out or sys.stdout
    scores = result.scores
    n2s, z, p = score_stats(scores, qn, result.orders, compat=compat_z)
    lines = []
    for i in range(result.nentries):
        lines.append("%-8s %d %g %g %g\n"
                     % (result.names[i], scores[i], n2s[i], z[i], p[i]))
        if lsoln:
            for k in range(qn):
                j = result.ssemaps[i, k]
                if j >= 0:
                    lines.append("%3d %3d\n" % (k + 1, j + 1))
    out.write("".join(lines))


def print_query_header(program: str, ltype: bool, lorder: bool, lsoln: bool,
                       qid: str, dbfile: str, out=None) -> None:
    """The '#' metadata headers downstream eval scripts key on
    (cudaSaTabsearch.cu:1027-1030; mkroctabs.py splits on '# QUERY ID =')."""
    out = out or sys.stdout
    tf = lambda b: "T" if b else "F"
    out.write("# %s LTYPE = %s LORDER = %s LSOLN = %s\n"
              % (program, tf(ltype), tf(lorder), tf(lsoln)))
    out.write("# QUERY ID = %-8s\n" % qid)
    out.write("# DBFILE = %-80s\n" % dbfile)
