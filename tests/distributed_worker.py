"""Worker process for the 2-process jax.distributed test.

Usage: python distributed_worker.py <coordinator> <nprocs> <pid> <outfile>

Each process owns 4 virtual CPU devices; the global 1-D mesh spans all
8.  Both processes execute the same SPMD program (XLA engine, entry
axis sharded); process 0 writes the all-gathered score vector to
``outfile``.  The parent test compares it against a single-process run.
"""

import os
import sys


def main():
    coordinator, nprocs, pid, outfile = sys.argv[1:5]
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 "
        + os.environ.get("XLA_FLAGS", ""))

    import jax

    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from cuda_satabsearch_tpu.parallel import distributed
    from cuda_satabsearch_tpu.parallel.mesh import entry_sharding, make_mesh

    distributed.initialize(coordinator_address=coordinator,
                           num_processes=int(nprocs),
                           process_id=int(pid))
    assert jax.process_count() == int(nprocs)
    assert len(jax.devices()) == 4 * int(nprocs)

    import numpy as np

    from conftest import random_entry
    from cuda_satabsearch_tpu.io.pack import pack_database, pack_query
    from cuda_satabsearch_tpu.ops.search import search_db

    rng = np.random.default_rng(42)
    entries = [random_entry(rng, int(n), f"e{i:03d}")
               for i, n in enumerate(rng.integers(4, 30, size=25))]
    query = pack_query(random_entry(rng, 9, "q"))

    mesh = make_mesh(jax.devices())
    db = pack_database(entries, pad_to=mesh.size)
    res = search_db(query, db, maxstart=16, lorder=True, seed=7,
                    query_tag=1, backend="xla",
                    sharding=entry_sharding(mesh))

    if distributed.is_primary():
        np.save(outfile, res.scores)
    jax.effects_barrier()


if __name__ == "__main__":
    main()
