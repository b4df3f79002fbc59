"""Hardware smoke: preprocess the two reference example structures and run
the production-config training loop for a few steps on the real TPU backend.

Usage: python scripts/tpu_train_smoke.py [workdir]

This drives the same path as cli/train.py (reference na_run.py semantics:
JSON config -> preprocess side files -> dataset/loader -> jitted train step
-> metrics/log/checkpoint) end-to-end on hardware, with the full-size model
(H=128, 3+3 layers, K=32) and the bf16+Pallas compute path.
"""
import json
import os
import shutil
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_train_smoke"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    examples = [
        "/root/reference/inference/examples/4oqu.pdb",
        "/root/reference/inference/examples/1am9.pdb",
    ]
    import pandas as pd
    csv_in = os.path.join(root, "input.csv")
    pd.DataFrame({"structure_path": examples}).to_csv(csv_in, index=False)

    out_dir = os.path.join(root, "preprocessed")
    from na_mpnn_tpu.cli.preprocess import main as preprocess_main
    pp_cfg = os.path.join(root, "pp.json")
    json.dump({"ATOMS_TO_LOAD": "backbone"}, open(pp_cfg, "w"))
    preprocess_main([csv_in, out_dir, "1", "0", pp_cfg])
    bad = os.listdir(os.path.join(out_dir, "bad"))
    assert not bad, f"preprocessing failed: {bad}"
    print("preprocessing ok", flush=True)

    rows = []
    for p in examples:
        name = os.path.splitext(os.path.basename(p))[0]
        row = {"structure_path": p, "sampling_probability": 1.0,
               "date": "2020-01-01", "ppm_paths": "[]"}
        for side in ["asmb_lengths", "asmb_interface_masks",
                     "asmb_side_chain_interface_masks",
                     "asmb_nearest_protein_side_chain_index",
                     "asmb_base_pair_masks", "asmb_base_pair_index",
                     "asmb_canonical_base_pair_masks",
                     "asmb_canonical_base_pair_index"]:
            row[f"{side}_path"] = f"{out_dir}/{side}/{name}.npy"
        rows.append(row)
    train_csv = os.path.join(root, "train.csv")
    pd.DataFrame(rows).to_csv(train_csv, index=False)

    base = os.path.join(root, "run")
    cfg = {
        "VOCAB_SIZE": 33, "NUM_LETTERS": 33,
        "PARSE_PROTEIN": 1, "PARSE_DNA": 1, "PARSE_RNA": 1,
        "PARSE_RNA_AS_DNA": 0, "NA_SHARED_TOKENS": 1, "NA_REF_ATOM": "C1'",
        "INCLUDE_PRED_NA_N": 1,
        "PROTEIN_BACKBONE_OCC_CUTOFF": 0.8,
        "PROTEIN_SIDE_CHAIN_OCC_CUTOFF": 0.5,
        "DNA_BACKBONE_OCC_CUTOFF": 0.8, "DNA_SIDE_CHAIN_OCC_CUTOFF": 0.5,
        "RNA_BACKBONE_OCC_CUTOFF": 0.8, "RNA_SIDE_CHAIN_OCC_CUTOFF": 0.5,
        "EXCLUDED_ELEMENTS": [1], "DATE_CUTOFF": "2030-01-01",
        "MAX_NUMBER_OF_PDBS_TRAIN": 2, "MAX_NUMBER_OF_PDBS_VALID": 2,
        "BATCH_TOKENS": 6000, "LOSS_TOKENS": 6000.0, "LABEL_SMOOTHING": 0.1,
        "EXCLUDE_RES": ["HOH"], "MIN_PROTEIN_LENGTH_CUTOFF": 1,
        "NUM_WORKERS": 0, "TOTAL_STEPS": 4, "RANDOMIZE_NMR_MODEL": 0,
        "CROP_LARGE_STRUCTURES": 0, "MIN_OVERLAP_LENGTH": 5,
        "DF_PATH_TRAIN": train_csv, "DF_PATH_VALID": train_csv,
        "BASE_FOLDER": base, "PREV_CHECKPOINT": "",
        "HIDDEN_DIM": 128, "NUM_ENCODER_LAYERS": 3, "NUM_DECODER_LAYERS": 3,
        "NUM_NEIGHBORS": 32, "DROPOUT": 0.1, "DECODE_PROTEIN_FIRST": 0,
        "PROTEIN_BACKBONE_NOISE": 0.1, "DNA_BACKBONE_NOISE": 0.1,
        "RNA_BACKBONE_NOISE": 0.1, "PARSE_PPMS": 0,
        "NA_ONLY_AS_UNIFORM_PPM": 0, "DROP_PROTEIN_PROBABILITY": 0,
        "PROTEIN_INTERFACE_RESIDUE_MUTATION_PROBABILITY": 0,
        "MUTATE_BASE_PAIR_TOGETHER": 0,
        "MUTATE_ENTIRE_SIDE_CHAIN_INTERFACE_PROBABILITY": 0,
        "NA_NON_INTERFACE_AS_UNIFORM_PPM": 0, "GRADIENT_NORM": 1.0,
        "MIXED_PRECISION": 1, "SAVE_EVERY_N_STEPS": 3,
        "ATOMS_TO_LOAD": "backbone", "METRICS_TO_COMPUTE": "basic",
    }
    from na_mpnn_tpu.train.trainer import run_training
    # Both example structures pack into one <=6000-token batch -> 1 step
    # per epoch.
    trainer = run_training(cfg, max_epochs=6)
    assert trainer.step >= cfg["TOTAL_STEPS"], trainer.step
    assert os.path.exists(os.path.join(base, "last.npz"))
    print(open(os.path.join(base, "log.txt")).read().strip().split("\n")[-1],
          flush=True)
    print(f"TPU TRAIN SMOKE OK step={trainer.step} "
          f"backend={__import__('jax').default_backend()}", flush=True)


if __name__ == "__main__":
    main()
