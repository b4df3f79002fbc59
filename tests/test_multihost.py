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


_TRAIN_WORKER = r"""
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
from na_mpnn_tpu.models import ModelConfig
from na_mpnn_tpu.train.trainer import Trainer

pid = int(sys.argv[1])
initialize_distributed(os.environ["NA_MPNN_COORD"], 2, pid)
assert jax.process_count() == 2 and jax.device_count() == 4

from __graft_entry__ import _synthetic_batch

mesh = make_mesh()  # data axis over all 4 devices, 2 per process
cfg = ModelConfig(hidden_dim=32, num_encoder_layers=1, num_decoder_layers=1,
                  k_neighbors=8, dropout=0.1)
trainer = Trainer(cfg, loss_tokens=128.0, mesh=mesh, seed=0)
batch = _synthetic_batch(B=4, L=32)  # same global batch on every host
key = jax.random.PRNGKey(7)
losses = []
for i in range(2):
    m = trainer.train_step(batch, jax.random.fold_in(key, i))
    losses.append(float(m["loss_av"]))
assert all(l == l and abs(l) < 1e6 for l in losses), losses  # finite
print(f"proc {pid} ok losses={losses[0]:.6f},{losses[1]:.6f}")
"""


def test_two_process_distributed_train_step(tmp_path):
    """One jitted train step (grads psum'd by GSPMD over gloo) across two
    real processes x 2 devices: both hosts must agree bit-for-bit on the
    loss trajectory."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["NA_MPNN_COORD"] = f"127.0.0.1:{port}"
    env["NA_MPNN_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))

    procs = [subprocess.Popen([sys.executable, "-c", _TRAIN_WORKER, str(i)],
                              env=env, cwd=env["NA_MPNN_REPO"],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host train-step smoke timed out")
        outs.append(out)
    marks = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        line = [l for l in out.splitlines() if f"proc {i} ok" in l]
        assert line, out
        marks.append(line[0].split("losses=")[1])
    assert marks[0] == marks[1], marks  # hosts agree on the loss trajectory


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
