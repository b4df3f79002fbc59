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


_PERHOST_WORKER = r"""
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

mesh = make_mesh()
cfg = ModelConfig(hidden_dim=32, num_encoder_layers=1, num_decoder_layers=1,
                  k_neighbors=8, dropout=0.1)
key = jax.random.PRNGKey(7)
batch = _synthetic_batch(B=4, L=32)

# Reference trajectory: every host feeds the full global batch.
t_rep = Trainer(cfg, loss_tokens=128.0, mesh=mesh, seed=0)
rep = [float(t_rep.train_step(batch, jax.random.fold_in(key, i))["loss_av"])
       for i in range(2)]

# Per-host feed: this host hands train_step ONLY its 2 of the 4 batch rows.
t_loc = Trainer(cfg, loss_tokens=128.0, mesh=mesh, seed=0, per_host_feed=True)
assert t_loc.per_host_feed
local = {k: v[pid * 2:(pid + 1) * 2] for k, v in batch.items()}
loc = [float(t_loc.train_step(local, jax.random.fold_in(key, i))["loss_av"])
       for i in range(2)]
assert rep == loc, (rep, loc)  # bit-identical to the replicated feed
print(f"proc {pid} ok perhost={loc[0]:.9f},{loc[1]:.9f}")
"""


_CKPT_WORKER = r"""
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
phase = sys.argv[2]
ckpt = os.environ["NA_MPNN_CKPT"]
initialize_distributed(os.environ["NA_MPNN_COORD"], 2, pid)
assert jax.process_count() == 2 and jax.device_count() == 4

from __graft_entry__ import _synthetic_batch

mesh = make_mesh()
cfg = ModelConfig(hidden_dim=32, num_encoder_layers=1, num_decoder_layers=1,
                  k_neighbors=8, dropout=0.1)
trainer = Trainer(cfg, loss_tokens=128.0, mesh=mesh, seed=0)
batch = _synthetic_batch(B=4, L=32)
key = jax.random.PRNGKey(7)

if phase == "a":
    for i in range(2):
        trainer.train_step(batch, jax.random.fold_in(key, i))
    trainer.save(ckpt, epoch=1, save_step=0)   # orbax dir, per-host shards
    tail = [float(trainer.train_step(
                batch, jax.random.fold_in(key, 2 + i))["loss_av"])
            for i in range(2)]
else:
    meta = trainer.restore(ckpt)
    assert trainer.step == 2, trainer.step
    tail = [float(trainer.train_step(
                batch, jax.random.fold_in(key, 2 + i))["loss_av"])
            for i in range(2)]
print(f"proc {pid} ok tail={tail[0]:.9f},{tail[1]:.9f}")
"""


def _run_pair(worker_src, extra_env=None, args=(), timeout=600):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["NA_MPNN_COORD"] = f"127.0.0.1:{port}"
    env["NA_MPNN_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env.update(extra_env or {})
    procs = [subprocess.Popen(
        [sys.executable, "-c", worker_src, str(i), *map(str, args)],
        env=env, cwd=env["NA_MPNN_REPO"], stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker pair timed out")
        outs.append(out)
    marks = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        line = [l for l in out.splitlines() if f"proc {i} ok" in l]
        assert line, out
        marks.append(line[0].split("ok ", 1)[1])
    return marks


def test_loader_shard_slices_clusters():
    """PrefetchLoader(shard=(p, P)) must parse ONLY this host's contiguous
    rows of each global batch, and the per-host slices must reassemble into
    the unsharded batch (same rows, same order)."""
    import numpy as np

    from na_mpnn_tpu import constants
    from na_mpnn_tpu.data.loader import PrefetchLoader

    class StubDataset:
        class config:
            atom_list_to_save = tuple(constants.BACKBONE_ATOMS)

        def __init__(self):
            self.calls = []

        def enable_parse_cache(self, n):
            pass

        def loader(self, example, assembly_id):
            i = example["i"]
            self.calls.append(i)
            L, nA = 4 + i, 16
            return {
                "X": np.full([L, nA, 3], float(i), np.float32),
                "X_m": np.ones([L, nA], np.int32),
                "S": np.full([L], i % 20, np.int64),
                "R_idx": np.arange(L, dtype=np.int32),
                "chain_labels": np.zeros([L], np.int64),
                "protein_mask": np.ones([L], np.int32),
                "dna_mask": np.zeros([L], np.int32),
                "rna_mask": np.zeros([L], np.int32),
                "R_polymer_type": np.full(
                    [L], constants.POLYTYPE_TO_INT["PP"], np.int64),
            }

    clusters = [[({"i": j}, "1") for j in range(5)]]

    full_ds = StubDataset()
    full = list(PrefetchLoader(full_ds, clusters, num_workers=0,
                               pad_batch_multiple=2))[0]
    assert full_ds.calls == [0, 1, 2, 3, 4]
    assert full["S"].shape[0] == 6  # bucket_batch(5) -> 6

    parts = []
    for p in range(2):
        ds = StubDataset()
        b = list(PrefetchLoader(ds, clusters, num_workers=0,
                                pad_batch_multiple=2, shard=(p, 2)))[0]
        # host p parsed only its contiguous 3 rows of the 6-row global batch
        assert ds.calls == list(range(5))[p * 3:(p + 1) * 3], ds.calls
        assert b["S"].shape[0] == 3
        parts.append(b)
    for k in ["S", "mask", "R_idx", "protein_mask"]:
        got = np.concatenate([parts[0][k], parts[1][k]], axis=0)
        np.testing.assert_array_equal(got, full[k], err_msg=k)

    # A host whose whole slice fails to parse still yields a batch (fully
    # masked), keeping per-host batch counts aligned.
    class FailTail(StubDataset):
        def loader(self, example, assembly_id):
            if example["i"] >= 3:
                self.calls.append(example["i"])
                return None
            return super().loader(example, assembly_id)

    ds = FailTail()
    b = list(PrefetchLoader(ds, clusters, num_workers=0,
                            pad_batch_multiple=2, shard=(1, 2)))[0]
    assert b["S"].shape[0] == 3
    assert np.all(b["mask"] == 0)


@pytest.mark.slow
def test_two_process_per_host_feed_matches_replicated():
    """Per-host sharded data feed (each process ships only its B-rows via
    jax.make_array_from_process_local_data) must produce a loss trajectory
    bit-identical to the replicated full-batch feed, and both hosts must
    agree."""
    marks = _run_pair(_PERHOST_WORKER)
    assert marks[0] == marks[1], marks


@pytest.mark.slow
def test_two_process_orbax_checkpoint_roundtrip(tmp_path):
    """2 processes x 2 devices: train 2 steps, orbax-save (per-host sharded
    writes), restart both processes, restore, and verify steps 3-4 continue
    bit-for-bit — the single-process preemption-resume contract, across
    processes (extends reference na_run.py:94-117,339-353)."""
    pytest.importorskip("orbax.checkpoint")
    ckpt = str(tmp_path / "ckpt.orbax")
    env = {"NA_MPNN_CKPT": ckpt}
    tail_a = _run_pair(_CKPT_WORKER, extra_env=env, args=("a",))
    assert tail_a[0] == tail_a[1], tail_a
    tail_b = _run_pair(_CKPT_WORKER, extra_env=env, args=("b",))
    assert tail_b[0] == tail_b[1], tail_b
    assert tail_a[0] == tail_b[0], (tail_a, tail_b)


@pytest.mark.slow
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


@pytest.mark.slow
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
