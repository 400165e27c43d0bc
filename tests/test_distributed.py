"""Multi-host execution: a REAL 2-process jax.distributed run on
localhost (4 virtual CPU devices per process, global 8-device mesh),
compared bitwise against a single-process run of the same search.

This exercises parallel/distributed.py end to end: coordinator
bring-up, the global mesh, SPMD execution where each process addresses
only half the shards, and the process_allgather score assembly
(distributed.to_host).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    out = tmp_path / "scores.npy"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "distributed_worker.py"),
         coordinator, "2", str(pid), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    scores2 = np.load(out)

    # single-process reference on the same (seeded) problem
    import jax

    from conftest import random_entry
    from cuda_satabsearch_tpu.io.pack import pack_database, pack_query
    from cuda_satabsearch_tpu.ops.search import search_db

    rng = np.random.default_rng(42)
    entries = [random_entry(rng, int(n), f"e{i:03d}")
               for i, n in enumerate(rng.integers(4, 30, size=25))]
    query = pack_query(random_entry(rng, 9, "q"))
    db = pack_database(entries)
    res = search_db(query, db, maxstart=16, lorder=True, seed=7,
                    query_tag=1, backend="xla")
    np.testing.assert_array_equal(scores2, res.scores)
