"""Two-process jax.distributed smoke test (CPU, localhost coordinator).

The reference has no distributed backend (SURVEY.md §2);
hlax/parallel/distributed.py is the multi-host entry point of the TPU-native
scaling story.  This test actually EXERCISES it: two OS processes, each with
2 virtual CPU devices, initialize through ``hlax.parallel.distributed``, see
the 4-device global device list, build the global (data x latent) mesh from
``hlax.parallel.mesh``, and run a jitted cross-process reduction whose value
is checked on both ranks.

This caught a real bug on first run: initialize() probed "already
initialized" via jax.process_count(), which brings the backend up and makes
jax.distributed.initialize() raise unconditionally in any true multi-process
launch.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from hlax.parallel import distributed
# idempotence: a second call must be a harmless no-op
distributed.initialize(coordinator_address="localhost:" + port,
                       num_processes=2, process_id=pid)
distributed.initialize(coordinator_address="localhost:" + port,
                       num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())
assert len(jax.local_devices()) == 2

from jax.sharding import NamedSharding, PartitionSpec as P
from hlax.parallel import mesh as pmesh
mesh = pmesh.make_mesh(n_data=2, n_latent=2)
sh = NamedSharding(mesh, P(pmesh.DATA_AXIS))

# global [4, 3] array assembled from per-process local shards: the mesh
# lays devices out (data, latent) = (2, 2), so each process IS one data
# shard (rows pid*2:pid*2+2) replicated over its two latent-axis devices
full = np.arange(12, dtype=np.float32).reshape(4, 3)
local = full[pid * 2:(pid + 1) * 2]
arrs = [jax.device_put(local, d) for d in jax.local_devices()]
x = jax.make_array_from_single_device_arrays((4, 3), sh, arrs)

# cross-process reduction over the 'data' axis (rides the gloo collective)
y = jax.jit(lambda a: jnp.sum(a * a),
            out_shardings=NamedSharding(mesh, P()))(x)
got = float(y.addressable_data(0))
want = float(np.sum(full * full))
assert got == want, (got, want)
print(f"proc {{pid}} OK {{got}}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    with socket.socket() as s:           # pick a free localhost port
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # workers set their own device count
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out
