"""Multi-host bring-up smoke test: two real processes initialize
jax.distributed through parallel.mesh.initialize_distributed (the contract
scripts/launch_training.sh drives per host) and run a cross-process psum on
the CPU backend."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

sys.path.insert(0, os.environ["NA_MPNN_REPO"])
from na_mpnn_tpu.parallel.mesh import initialize_distributed, make_mesh

pid = int(sys.argv[1])
initialize_distributed(os.environ["NA_MPNN_COORD"], 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh()
local = jnp.ones((2, 4)) * (pid + 1)
arrs = [jax.device_put(local[i:i+1], d)
        for i, d in enumerate(mesh.local_mesh.devices.reshape(-1))]
global_x = jax.make_array_from_single_device_arrays(
    (4, 4), NamedSharding(mesh, P("data")), arrs)
total = jax.jit(lambda x: jnp.sum(x),
                out_shardings=NamedSharding(mesh, P()))(global_x)
expected = 8.0 * 1 + 8.0 * 2
assert float(total) == expected, (float(total), expected)
print(f"proc {pid} ok total={float(total)}")
"""


def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["NA_MPNN_COORD"] = f"127.0.0.1:{port}"
    env["NA_MPNN_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))

    procs = [subprocess.Popen([sys.executable, "-c", _WORKER, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host smoke test timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} ok" in out
