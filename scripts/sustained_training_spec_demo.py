"""Sustained SPECIFICITY-mode training rehearsal on the real chip
(VERDICT r4 item 8): the PPM-supervised path — PARSE_PPMS, soft-label
loss, uniform-PPM augmentations — exercised for a few hundred optimizer
steps through the full host pipeline (reference specificity_model.json:
44-50; soft labels na_model_utils.py:111-146).

Synthetic per-structure DNA PPM CSVs ride the train CSV's ppm_paths
column; the run asserts that
  * PPM-supervised tokens actually flow (ppm_mask populates per epoch),
  * the PPM cross-entropy on a held-out PPM-supervised batch DESCENDS
    (measured against the same fixed batch before and after training),
  * the overall train loss descends.

Writes artifacts/sustained_training_spec/{summary.json, log.txt}.

Usage: python scripts/sustained_training_spec_demo.py [--steps 200]
"""
import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from sustained_training_demo import build_dataset  # noqa: E402 (same dir)


def write_synthetic_ppm(path, L, seed):
    """DNA PPM csv (columns A,C,G,T — the load_ppms contract) with a
    sharp-ish random preference per position so the soft-label CE has
    signal to descend toward."""
    import pandas as pd

    rng = np.random.RandomState(seed)
    logits = rng.randn(L, 4) * 2.0
    p = np.exp(logits)
    p /= p.sum(axis=1, keepdims=True)
    pd.DataFrame({c: p[:, i] for i, c in enumerate("ACGT")}).to_csv(
        path, index=False)


def attach_ppms(train_csv, root, seed0=1000):
    """Give every structure a short motif-length DNA PPM (8-16 bases — the
    realistic TF-motif regime; the reference's weighted alignment is
    O(ppm_len^2 * chain_len) per chain, so chain-length PPMs would blow it
    up cubically)."""
    import pandas as pd

    df = pd.read_csv(train_csv)
    ppm_dir = os.path.join(root, "ppms")
    os.makedirs(ppm_dir, exist_ok=True)
    rng = np.random.RandomState(seed0)
    ppm_col = []
    for i, _row in df.iterrows():
        p = os.path.join(ppm_dir, f"ppm{i}.csv")
        write_synthetic_ppm(p, int(rng.randint(8, 17)), seed0 + i)
        ppm_col.append(str([[p]]))
    df["ppm_paths"] = ppm_col
    out = os.path.join(root, "train_spec.csv")
    df.to_csv(out, index=False)
    return out


def ppm_cross_entropy(trainer, np_batch):
    """CE between the model's log-probs and the soft PPM labels over
    ppm-masked tokens (deterministic forward)."""
    import jax.numpy as jnp

    from na_mpnn_tpu.models import forward

    batch = trainer._device_batch(np_batch)
    log_probs, _ = forward(trainer.params, trainer.cfg, batch,
                           deterministic=True)
    pm = batch["ppm_mask"].astype(jnp.float32)
    ce = -jnp.sum(batch["aligned_ppm"].astype(jnp.float32)
                  * log_probs, axis=-1)
    denom = jnp.maximum(jnp.sum(pm), 1.0)
    return float(jnp.sum(ce * pm) / denom), float(jnp.sum(pm))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--structures", type=int, default=32)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--root", default="/tmp/sustained_spec_demo")
    ap.add_argument("--artifacts",
                    default=os.path.join(REPO, "artifacts",
                                         "sustained_training_spec"))
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    t0 = time.perf_counter()
    train_csv = build_dataset(args.root, args.structures)
    train_csv = attach_ppms(train_csv, args.root)
    print(f"dataset built in {time.perf_counter() - t0:.1f}s", flush=True)

    base = os.path.join(args.root, "run")
    shutil.rmtree(base, ignore_errors=True)
    cfg = {
        "VOCAB_SIZE": 33, "NUM_LETTERS": 33,
        "PARSE_PROTEIN": 1, "PARSE_DNA": 1, "PARSE_RNA": 1,
        "PARSE_RNA_AS_DNA": 0, "NA_SHARED_TOKENS": 1, "NA_REF_ATOM": "C1'",
        "INCLUDE_PRED_NA_N": 1,
        "PROTEIN_BACKBONE_OCC_CUTOFF": 0.8, "PROTEIN_SIDE_CHAIN_OCC_CUTOFF": 0.5,
        "DNA_BACKBONE_OCC_CUTOFF": 0.8, "DNA_SIDE_CHAIN_OCC_CUTOFF": 0.5,
        "RNA_BACKBONE_OCC_CUTOFF": 0.8, "RNA_SIDE_CHAIN_OCC_CUTOFF": 0.5,
        "EXCLUDED_ELEMENTS": [1], "DATE_CUTOFF": "2030-01-01",
        "MAX_NUMBER_OF_PDBS_TRAIN": args.structures,
        "MAX_NUMBER_OF_PDBS_VALID": 8,
        "BATCH_TOKENS": 6000, "LOSS_TOKENS": 2000, "LABEL_SMOOTHING": 0.1,
        "EXCLUDE_RES": ["HOH"], "MIN_PROTEIN_LENGTH_CUTOFF": 1,
        "NUM_WORKERS": args.workers, "TOTAL_STEPS": args.steps,
        "RANDOMIZE_NMR_MODEL": 0, "CROP_LARGE_STRUCTURES": 0,
        "MIN_OVERLAP_LENGTH": 5,
        "DF_PATH_TRAIN": train_csv, "DF_PATH_VALID": train_csv,
        "BASE_FOLDER": base, "PREV_CHECKPOINT": "",
        "HIDDEN_DIM": 128, "NUM_ENCODER_LAYERS": 3, "NUM_DECODER_LAYERS": 3,
        "NUM_NEIGHBORS": 32, "DROPOUT": 0.1, "DECODE_PROTEIN_FIRST": 0,
        "PROTEIN_BACKBONE_NOISE": 0.1, "DNA_BACKBONE_NOISE": 0.1,
        "RNA_BACKBONE_NOISE": 0.1,
        # -- the specificity-mode block (specificity_model.json:44-50) --
        "PARSE_PPMS": 1,
        "NA_ONLY_AS_UNIFORM_PPM": 1,
        "DROP_PROTEIN_PROBABILITY": 0.5,
        "PROTEIN_INTERFACE_RESIDUE_MUTATION_PROBABILITY": 0,
        "MUTATE_BASE_PAIR_TOGETHER": 0,
        "MUTATE_ENTIRE_SIDE_CHAIN_INTERFACE_PROBABILITY": 0,
        "NA_NON_INTERFACE_AS_UNIFORM_PPM": 1,
        # ---------------------------------------------------------------
        "GRADIENT_NORM": 1.0, "MIXED_PRECISION": 1,
        "SAVE_EVERY_N_STEPS": 1000,
        "ATOMS_TO_LOAD": "backbone", "METRICS_TO_COMPUTE": "basic",
    }

    # Fixed PPM-supervised eval batch: loaded once through the SAME dataset
    # path (PPMs aligned), reused before/after training for the PPM-CE
    # descent check.
    from na_mpnn_tpu.data.dataset import DatasetConfig, NADataset
    from na_mpnn_tpu.data.parsers import make_parsers
    from na_mpnn_tpu.train.collate import collate_batch
    from na_mpnn_tpu.train.trainer import model_config_from_params, run_training
    import pandas as pd

    ds_cfg = DatasetConfig(parse_ppms=True, min_overlap_length=5,
                           na_only_as_uniform_ppm=True,
                           na_non_interface_as_uniform_ppm=True)
    cif_parser, pdb_parser = make_parsers()
    dataset = NADataset(cif_parser=cif_parser, pdb_parser=pdb_parser,
                        config=ds_cfg)
    df = pd.read_csv(train_csv)
    structures = []
    for _, row in df.head(4).iterrows():
        lengths = np.load(row["asmb_lengths_path"], allow_pickle=True).item()
        s = dataset.loader(dict(row), next(iter(lengths.keys())))
        if s:
            structures.append(s)
    eval_batch = collate_batch(structures)
    ppm_tokens_eval = float(np.sum(eval_batch["ppm_mask"]))
    assert ppm_tokens_eval > 0, "eval batch carries no PPM-supervised tokens"

    from na_mpnn_tpu.train.trainer import Trainer
    probe = Trainer(model_config_from_params(cfg), seed=0)
    ce_before, _ = ppm_cross_entropy(probe, eval_batch)

    t1 = time.perf_counter()
    trainer = run_training(cfg)
    wall = time.perf_counter() - t1

    ce_after, n_pm = ppm_cross_entropy(trainer, eval_batch)

    from na_mpnn_tpu.eval.visualize import parse_training_log
    log_path = os.path.join(base, "log.txt")
    dflog = parse_training_log(log_path)
    first_loss = float(dflog["train_loss"].iloc[0])
    last_loss = float(dflog["train_loss"].tail(3).mean())

    os.makedirs(args.artifacts, exist_ok=True)
    shutil.copy(log_path, os.path.join(args.artifacts, "log.txt"))
    summary = {
        "mode": "specificity (PARSE_PPMS + soft-label CE + uniform-PPM aug)",
        "steps": int(trainer.step),
        "wall_s": round(wall, 2),
        "ppm_supervised_tokens_eval_batch": int(ppm_tokens_eval),
        "ppm_ce_before": round(ce_before, 4),
        "ppm_ce_after": round(ce_after, 4),
        "ppm_ce_descended": bool(ce_after < ce_before - 0.1),
        "train_loss_first_epoch": round(first_loss, 4),
        "train_loss_last": round(last_loss, 4),
        "loss_descended": bool(last_loss < first_loss - 0.05),
        "epoch_rows": int(len(dflog)),
        "config_block": {k: cfg[k] for k in
                         ["PARSE_PPMS", "NA_ONLY_AS_UNIFORM_PPM",
                          "DROP_PROTEIN_PROBABILITY",
                          "NA_NON_INTERFACE_AS_UNIFORM_PPM"]},
    }
    with open(os.path.join(args.artifacts, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)
    assert summary["ppm_ce_descended"], (ce_before, ce_after)
    assert summary["loss_descended"], (first_loss, last_loss)


if __name__ == "__main__":
    main()
