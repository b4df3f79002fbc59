"""Checkpoint-sweep CLI: scores a directory of s_* checkpoints on a split
(the reference does this with Slurm arrays, evaluation_cmds.txt:1-63)."""
import json
import os

import numpy as np
import pytest

from na_mpnn_tpu.cli.sweep import list_checkpoints, run_sweep

EXAMPLES = "/root/reference/inference/examples"


def test_list_checkpoints_orders_by_step(tmp_path):
    for name in ["s_3000.npz", "s_200.npz", "s_19137.pt", "last.npz",
                 "s_bad.npz"]:
        (tmp_path / name).write_bytes(b"x")
    got = [os.path.basename(p) for p in list_checkpoints(str(tmp_path))]
    assert got == ["s_200.npz", "s_3000.npz", "s_19137.pt"]


def test_design_sweep_on_example(tmp_path):
    """Two random-init checkpoints swept on 4oqu: table rows + best pick."""
    import jax
    from na_mpnn_tpu.models import ModelConfig, init_params
    from na_mpnn_tpu.train.checkpoint import save_checkpoint_npz

    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    cfg = ModelConfig()
    for step, seed in [(1000, 0), (2000, 1)]:
        save_checkpoint_npz(str(ckpt_dir / f"s_{step}.npz"),
                            init_params(jax.random.PRNGKey(seed), cfg),
                            meta={"step": step})

    csv = tmp_path / "structures.csv"
    csv.write_text(f"structure_path\n{EXAMPLES}/4oqu.pdb\n")

    result = run_sweep(str(ckpt_dir), str(csv), "design", num_samples=2,
                       temperature=0.2, out=str(tmp_path / "sweep.json"),
                       workdir=str(tmp_path / "work"))
    assert len(result["table"]) == 2
    for entry in result["table"]:
        assert entry["metric"] == "sequence_recovery"
        assert entry["n_designs"] == 2
        assert np.isfinite(entry["value"])
    assert result["best_checkpoint"]["checkpoint"] in [
        e["checkpoint"] for e in result["table"]]
    saved = json.load(open(tmp_path / "sweep.json"))
    assert saved["best_checkpoint"] is not None
