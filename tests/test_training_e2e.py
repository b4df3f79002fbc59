"""End-to-end training integration test: synthetic PDBs -> preprocessing CLI
-> training loop (1 epoch) -> log + checkpoint -> resume. All host/CPU."""
import json
import os

import numpy as np
import pytest

from na_mpnn_tpu import constants


def _write_synthetic_pdb(path, L_protein=12, L_dna=10, seed=0):
    """Protein chain A + DNA duplex-ish chain B with full backbone atoms."""
    rng = np.random.RandomState(seed)
    lines = []
    serial = 1

    def atom_line(name, resname, chain, resnum, xyz, element):
        nonlocal serial
        nm = name if len(name) == 4 else " " + name
        line = (f"ATOM  {serial:>5} {nm:<4} {resname:>3} {chain}{resnum:>4}    "
                f"{xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}  1.00  0.00          "
                f"{element:>2}")
        lines.append(line)
        serial += 1

    pos = np.zeros(3)
    protein_names = ["GLY", "ALA", "SER", "LEU"]
    for i in range(L_protein):
        pos = pos + rng.randn(3) * 1.5 + np.array([3.8, 0, 0])
        resname = protein_names[i % len(protein_names)]
        for name in constants.PROTEIN_BACKBONE_ATOMS:
            atom_line(name, resname, "A", i + 1,
                      pos + rng.randn(3) * 0.8, name[0])
    pos = np.array([0.0, 15.0, 0.0])
    dna_names = ["DA", "DC", "DG", "DT"]
    for i in range(L_dna):
        pos = pos + rng.randn(3) * 1.5 + np.array([4.5, 0, 0])
        resname = dna_names[i % 4]
        for name in constants.DNA_BACKBONE_ATOMS:
            atom_line(name, resname, "B", i + 1,
                      pos + rng.randn(3) * 1.0, name.strip("'0123456789")[0])
    lines.append("END")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_ds")
    struct_dir = root / "structures"
    os.makedirs(struct_dir)
    rows = []
    for i in range(3):
        p = str(struct_dir / f"s{i}.pdb")
        _write_synthetic_pdb(p, seed=i)
        rows.append(p)

    # run the preprocessing CLI to create the side files
    import pandas as pd
    csv_in = str(root / "input.csv")
    pd.DataFrame({"structure_path": rows}).to_csv(csv_in, index=False)
    out_dir = str(root / "preprocessed")
    from na_mpnn_tpu.cli.preprocess import main as preprocess_main
    cfg_path = str(root / "pp.json")
    json.dump({"ATOMS_TO_LOAD": "backbone"}, open(cfg_path, "w"))
    preprocess_main([csv_in, out_dir, "1", "0", cfg_path])

    bad = os.listdir(os.path.join(out_dir, "bad"))
    assert not bad, f"preprocessing failed for {bad}"

    # training CSV with side-file paths
    train_rows = []
    for i, p in enumerate(rows):
        name = f"s{i}"
        train_rows.append({
            "structure_path": p,
            "sampling_probability": 1.0,
            "date": "2020-01-01",
            "ppm_paths": "[]",
            "asmb_lengths_path": f"{out_dir}/asmb_lengths/{name}.npy",
            "asmb_interface_masks_path": f"{out_dir}/asmb_interface_masks/{name}.npy",
            "asmb_side_chain_interface_masks_path":
                f"{out_dir}/asmb_side_chain_interface_masks/{name}.npy",
            "asmb_nearest_protein_side_chain_index_path":
                f"{out_dir}/asmb_nearest_protein_side_chain_index/{name}.npy",
            "asmb_base_pair_masks_path": f"{out_dir}/asmb_base_pair_masks/{name}.npy",
            "asmb_base_pair_index_path": f"{out_dir}/asmb_base_pair_index/{name}.npy",
            "asmb_canonical_base_pair_masks_path":
                f"{out_dir}/asmb_canonical_base_pair_masks/{name}.npy",
            "asmb_canonical_base_pair_index_path":
                f"{out_dir}/asmb_canonical_base_pair_index/{name}.npy",
        })
    train_csv = str(root / "train.csv")
    pd.DataFrame(train_rows).to_csv(train_csv, index=False)
    return {"root": str(root), "train_csv": train_csv}


def test_preprocessing_outputs(mini_dataset):
    out = os.path.join(mini_dataset["root"], "preprocessed")
    lengths = np.load(os.path.join(out, "asmb_lengths", "s0.npy"),
                      allow_pickle=True).item()
    (macro_L, protein_L, dna_L, rna_L) = lengths["1"]
    assert macro_L == 22 and protein_L == 12 and dna_L == 10 and rna_L == 0
    seq_csv = open(os.path.join(out, "sequences", "s0.csv")).read()
    assert "polypeptide(L)" in seq_csv and "polydeoxyribonucleotide" in seq_csv


def _train_cfg(mini_dataset, base, **overrides):
    cfg = {
        "VOCAB_SIZE": 33, "NUM_LETTERS": 33,
        "PARSE_PROTEIN": 1, "PARSE_DNA": 1, "PARSE_RNA": 1,
        "PARSE_RNA_AS_DNA": 0, "NA_SHARED_TOKENS": 1, "NA_REF_ATOM": "C1'",
        "INCLUDE_PRED_NA_N": 1,
        "PROTEIN_BACKBONE_OCC_CUTOFF": 0.8, "PROTEIN_SIDE_CHAIN_OCC_CUTOFF": 0.5,
        "DNA_BACKBONE_OCC_CUTOFF": 0.8, "DNA_SIDE_CHAIN_OCC_CUTOFF": 0.5,
        "RNA_BACKBONE_OCC_CUTOFF": 0.8, "RNA_SIDE_CHAIN_OCC_CUTOFF": 0.5,
        "EXCLUDED_ELEMENTS": [1], "DATE_CUTOFF": "2030-01-01",
        "MAX_NUMBER_OF_PDBS_TRAIN": 3, "MAX_NUMBER_OF_PDBS_VALID": 3,
        "BATCH_TOKENS": 128, "LOSS_TOKENS": 128, "LABEL_SMOOTHING": 0.1,
        "EXCLUDE_RES": ["HOH"], "MIN_PROTEIN_LENGTH_CUTOFF": 1,
        "NUM_WORKERS": 0, "TOTAL_STEPS": 4, "RANDOMIZE_NMR_MODEL": 0,
        "CROP_LARGE_STRUCTURES": 0, "MIN_OVERLAP_LENGTH": 5,
        "DF_PATH_TRAIN": mini_dataset["train_csv"],
        "DF_PATH_VALID": mini_dataset["train_csv"],
        "BASE_FOLDER": base, "PREV_CHECKPOINT": "",
        "HIDDEN_DIM": 32, "NUM_ENCODER_LAYERS": 1, "NUM_DECODER_LAYERS": 1,
        "NUM_NEIGHBORS": 8, "DROPOUT": 0.1, "DECODE_PROTEIN_FIRST": 0,
        "PROTEIN_BACKBONE_NOISE": 0.1, "DNA_BACKBONE_NOISE": 0.1,
        "RNA_BACKBONE_NOISE": 0.1, "PARSE_PPMS": 0,
        "NA_ONLY_AS_UNIFORM_PPM": 0, "DROP_PROTEIN_PROBABILITY": 0,
        "PROTEIN_INTERFACE_RESIDUE_MUTATION_PROBABILITY": 0,
        "MUTATE_BASE_PAIR_TOGETHER": 0,
        "MUTATE_ENTIRE_SIDE_CHAIN_INTERFACE_PROBABILITY": 0,
        "NA_NON_INTERFACE_AS_UNIFORM_PPM": 0, "GRADIENT_NORM": 1.0,
        "MIXED_PRECISION": 0, "SAVE_EVERY_N_STEPS": 2,
        "ATOMS_TO_LOAD": "backbone", "METRICS_TO_COMPUTE": "basic",
    }
    cfg.update(overrides)
    return cfg


def test_training_loop_end_to_end(mini_dataset, tmp_path):
    from na_mpnn_tpu.train.trainer import run_training

    base = str(tmp_path / "run")
    cfg = _train_cfg(mini_dataset, base)
    trainer = run_training(cfg, max_epochs=2)
    assert trainer.step >= 2
    assert os.path.exists(base + "/last.npz")
    log = open(base + "/log.txt").read()
    assert "train_loss" in log and "valid_accuracy" in log
    jsonl = [json.loads(l) for l in open(base + "/log.jsonl")]
    assert np.isfinite(jsonl[-1]["train_loss"])

    # resume: restores step + optimizer state
    cfg2 = dict(cfg)
    cfg2["PREV_CHECKPOINT"] = base + "/last.npz"
    trainer2 = run_training(cfg2, max_epochs=1)
    assert trainer2.step > trainer.step - 1


def test_training_loop_all_atom_table(mini_dataset, tmp_path):
    """ATOMS_TO_LOAD="all" trains end-to-end: the 65-atom table flows
    dataset -> collate -> model (reference na_run.py:34-41)."""
    import json as _json

    from na_mpnn_tpu.train.trainer import run_training

    base = str(tmp_path / "run_all")
    cfg = _train_cfg(mini_dataset, base, ATOMS_TO_LOAD="all", TOTAL_STEPS=1,
                     MAX_NUMBER_OF_PDBS_TRAIN=2, MAX_NUMBER_OF_PDBS_VALID=1)
    trainer = run_training(cfg, max_epochs=1)
    assert trainer.cfg.atom_table == "all"
    assert trainer.cfg.total_atoms == 67
    jsonl = [_json.loads(l) for l in open(base + "/log.jsonl")]
    assert np.isfinite(jsonl[-1]["train_loss"])


def test_prefetch_loader_workers(mini_dataset):
    """PrefetchLoader with worker processes produces the same batches as the
    inline path."""
    import pandas as pd
    from na_mpnn_tpu.data.dataset import DatasetConfig, NADataset, make_batch_iter
    from na_mpnn_tpu.data.loader import PrefetchLoader
    from na_mpnn_tpu.data.parsers import make_parsers

    df = pd.read_csv(mini_dataset["train_csv"])
    df["date"] = pd.to_datetime(df["date"], format="%Y-%m-%d")
    cif, pdb = make_parsers()
    ds = NADataset(cif_parser=cif, pdb_parser=pdb,
                   config=DatasetConfig(batch_tokens=128))
    cutoff = pd.to_datetime("2030-01-01", format="%Y-%m-%d")
    np.random.seed(0)
    clusters = list(make_batch_iter(df, 128, 1, cutoff, False, 10))
    inline = [b for b in PrefetchLoader(ds, clusters, num_workers=0)]
    pooled_loader = PrefetchLoader(ds, clusters, num_workers=2)
    pooled = [b for b in pooled_loader]
    assert len(inline) == len(pooled) > 0
    for a, b in zip(inline, pooled):
        np.testing.assert_array_equal(a["X"], b["X"])
        np.testing.assert_array_equal(a["S"], b["S"])
    # second epoch over the SAME persistent pool (workers now serve parses
    # from their caches) is identical
    pooled2 = [b for b in pooled_loader]
    for a, b in zip(pooled, pooled2):
        np.testing.assert_array_equal(a["X"], b["X"])
        np.testing.assert_array_equal(a["S"], b["S"])
    pooled_loader.close()


def test_parse_cache_repeat_visit_identical(mini_dataset):
    """A cached parse re-served on a later visit yields exactly the batch a
    fresh no-cache dataset yields (the cached object is never mutated by
    loader()/load_assembly)."""
    import pandas as pd
    from na_mpnn_tpu.data.dataset import DatasetConfig, NADataset, make_batch_iter
    from na_mpnn_tpu.data.loader import PrefetchLoader
    from na_mpnn_tpu.data.parsers import make_parsers

    df = pd.read_csv(mini_dataset["train_csv"])
    df["date"] = pd.to_datetime(df["date"], format="%Y-%m-%d")
    cutoff = pd.to_datetime("2030-01-01", format="%Y-%m-%d")
    np.random.seed(0)
    clusters = list(make_batch_iter(df, 128, 1, cutoff, False, 10))

    cif, pdb = make_parsers()
    cached = NADataset(cif_parser=cif, pdb_parser=pdb,
                       config=DatasetConfig(batch_tokens=128))
    cached.enable_parse_cache(64)
    # visit everything twice through the cache
    np.random.seed(1)
    first = [b for b in PrefetchLoader(cached, clusters, num_workers=0)]
    np.random.seed(1)
    second = [b for b in PrefetchLoader(cached, clusters, num_workers=0)]

    cif2, pdb2 = make_parsers()
    fresh = NADataset(cif_parser=cif2, pdb_parser=pdb2,
                      config=DatasetConfig(batch_tokens=128))
    np.random.seed(1)
    nocache = [b for b in PrefetchLoader(fresh, clusters, num_workers=0,
                                         parse_cache_size=0)]
    for a, b, c in zip(first, second, nocache):
        np.testing.assert_array_equal(a["X"], b["X"])
        np.testing.assert_array_equal(a["X"], c["X"])
        np.testing.assert_array_equal(a["S"], c["S"])


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax directory checkpoints (CHECKPOINT_FORMAT=orbax): Trainer.save
    writes live jax.Arrays + meta + leaf-indexed optimizer state; restore and
    load_params_any round-trip exactly."""
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.models import ModelConfig
    from na_mpnn_tpu.train.checkpoint import load_params_any
    from na_mpnn_tpu.train.trainer import Trainer

    cfg = ModelConfig(hidden_dim=32, num_encoder_layers=1,
                      num_decoder_layers=1, k_neighbors=8)
    trainer = Trainer(cfg, seed=0)
    trainer.step = 13
    path = str(tmp_path / "s_13.orbax")
    trainer.save(path, epoch=2, save_step=10)
    assert os.path.isdir(path)

    ref_params = jax.tree.map(np.asarray, trainer.params)
    ref_opt = [np.asarray(v) for v in jax.tree.leaves(trainer.opt_state)]

    # clobber, then restore
    trainer.params = jax.tree.map(lambda v: v * 0, trainer.params)
    trainer.opt_state = jax.tree.map(lambda v: v * 0 if hasattr(v, "dtype")
                                     else v, trainer.opt_state)
    trainer.step = 0
    meta = trainer.restore(path)
    assert trainer.step == 13 and int(meta["epoch"]) == 2 \
        and int(meta["save_step"]) == 10
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 trainer.params, ref_params)
    for got, want in zip(jax.tree.leaves(trainer.opt_state), ref_opt):
        np.testing.assert_array_equal(np.asarray(got), want)

    # the generic loader accepts the directory format too
    params2, meta2 = load_params_any(path, cfg)
    assert int(meta2["step"]) == 13
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 params2, ref_params)

    # overwrite in place (the last.orbax every-epoch pattern)
    trainer.save(path, epoch=3, save_step=12)
    assert int(trainer.restore(path)["epoch"]) == 3


def test_restore_legacy_per_leaf_optimizer_state(tmp_path):
    """Checkpoints written by the pre-fused optimizer (per-leaf Adam: count,
    mu x N, nu x N, schedule count) must restore into the fused flat layout
    with the moments concatenated in tree order."""
    import jax
    from na_mpnn_tpu.models import ModelConfig
    from na_mpnn_tpu.train.checkpoint import save_checkpoint_npz
    from na_mpnn_tpu.train.trainer import Trainer

    cfg = ModelConfig(hidden_dim=32, num_encoder_layers=1,
                      num_decoder_layers=1, k_neighbors=8)
    t = Trainer(cfg, seed=0)
    leaves = [np.asarray(v) for v in jax.tree.leaves(t.params)]
    rng = np.random.RandomState(0)
    mu = [rng.randn(*l.shape).astype(np.float32) for l in leaves]
    nu = [rng.rand(*l.shape).astype(np.float32) for l in leaves]
    legacy = {"leaf0000": np.asarray(7, np.int32)}
    for i, x in enumerate(mu + nu):
        legacy[f"leaf{i + 1:04d}"] = x
    legacy[f"leaf{1 + 2 * len(leaves):04d}"] = np.asarray(7, np.int32)

    path = str(tmp_path / "legacy.npz")
    params_host = jax.tree.map(np.asarray, t.params)
    save_checkpoint_npz(path, params_host, meta={"step": 9},
                        opt_state_flat=legacy)
    t2 = Trainer(cfg, seed=1)
    t2.restore(path)
    got = [np.asarray(v) for v in jax.tree.leaves(t2.opt_state)]
    assert len(got) == 4
    assert int(got[0]) == 7 and int(got[-1]) == 7
    np.testing.assert_array_equal(
        got[1], np.concatenate([x.reshape(-1) for x in mu]))
    np.testing.assert_array_equal(
        got[2], np.concatenate([x.reshape(-1) for x in nu]))


def test_packed_feed_matches_direct_path():
    """train_step's packed single-buffer feed must match the direct
    device_put path: bit-identical for every key except X, whose packed
    form is 0.01-A fixed-point (|error| <= 0.005 A, far below the 0.1 A
    training noise)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _synthetic_batch
    from na_mpnn_tpu.models import ModelConfig
    from na_mpnn_tpu.train.trainer import BATCH_KEYS, Trainer

    cfg = ModelConfig(dropout=0.1, protein_augment_eps=0.1,
                      dna_augment_eps=0.1, rna_augment_eps=0.1,
                      compute_dtype="float32", kernels="xla")
    nb = _synthetic_batch(B=2, L=64)
    arrays = {k: nb[k] for k in BATCH_KEYS if k in nb}

    # layout round-trip: unpack(pack(x)) == x (X to quantization)
    t1 = Trainer(cfg, seed=0)
    assert t1._quantize_x  # all augment eps >= 0.05 -> q16 wire format on
    packed, layout = t1._pack_np_batch(arrays)
    out = jax.jit(lambda p: Trainer._unpack_batch(p, layout))(
        jnp.asarray(packed))
    for k in arrays:
        got = np.asarray(out[k])
        want = np.asarray(arrays[k])
        if k == "X":
            assert np.max(np.abs(got - want)) <= 0.005 + 1e-7
        else:
            np.testing.assert_array_equal(got, want.astype(got.dtype), err_msg=k)

    # one full step: losses agree to quantization-level tolerance
    key = jax.random.PRNGKey(3)
    m1 = t1.train_step(nb, key)                       # packed path
    t2 = Trainer(cfg, seed=0)
    batch = t2._device_batch(nb)
    t2.params, t2.opt_state, m2 = t2._train_step(t2.params, t2.opt_state,
                                                 batch, key)
    assert abs(float(m1["loss_av"]) - float(m2["loss_av"])) < 1e-3


def test_packed_feed_noise_free_config_keeps_f32_coords():
    """When backbone noise is configured to 0 (noise-free fine-tuning) the
    packed feed must NOT quantize X: the 0.005-A rounding would otherwise
    silently perturb inputs with nothing to hide it under (advisor r4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _synthetic_batch
    from na_mpnn_tpu.models import ModelConfig
    from na_mpnn_tpu.train.trainer import BATCH_KEYS, Trainer

    cfg = ModelConfig(dropout=0.0, protein_augment_eps=0.0,
                      dna_augment_eps=0.0, rna_augment_eps=0.0,
                      compute_dtype="float32", kernels="xla")
    t = Trainer(cfg, seed=0)
    assert not t._quantize_x
    nb = _synthetic_batch(B=1, L=48)
    arrays = {k: nb[k] for k in BATCH_KEYS if k in nb}
    packed, layout = t._pack_np_batch(arrays)
    out = jax.jit(lambda p: Trainer._unpack_batch(p, layout))(
        jnp.asarray(packed))
    np.testing.assert_array_equal(np.asarray(out["X"]),
                                  np.asarray(arrays["X"], np.float32))


def test_packed_feed_wire_edge_cases():
    """Edge cases of the low-entropy wire formats: all-ones masks must take
    the bit-packed path, a last dim not divisible by 8 round-trips, and
    coordinates near the +-327 A quantization cap delta-code exactly
    (wraparound int16 deltas under the device-side wrapping cumsum)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from na_mpnn_tpu.models import ModelConfig
    from na_mpnn_tpu.train.trainer import Trainer

    t = Trainer(ModelConfig(dropout=0.1, protein_augment_eps=0.1,
                            dna_augment_eps=0.1, rna_augment_eps=0.1,
                            compute_dtype="float32", kernels="xla"), seed=0)
    assert t._quantize_x
    rng = np.random.RandomState(0)
    B, L, nA = 2, 21, 16   # L=21: bits pad within the last byte
    arrays = {
        # big jumps between consecutive residues exercise int16 delta wrap
        "X": (rng.rand(B, L, nA, 3).astype(np.float32) * 650.0 - 325.0),
        "X_m": np.ones([B, L, nA], np.int32),           # all-ones -> bits
        "mask": np.ones([B, L], np.int32),              # all-ones -> bits
        "S": rng.randint(0, 33, (B, L)).astype(np.int64),
        "R_idx": np.arange(L, dtype=np.int32)[None].repeat(B, 0),
        "protein_mask": rng.randint(0, 2, (B, L)).astype(np.int32),
    }
    packed, layout = t._pack_np_batch(arrays)
    wire = {e[0]: e[3] for e in layout}
    assert wire["X"] == "q16x100d"
    assert wire["X_m"] == "bits" and wire["mask"] == "bits"
    out = jax.jit(lambda p: Trainer._unpack_batch(p, layout))(
        jnp.asarray(packed))
    np.testing.assert_array_equal(np.asarray(out["X_m"]), arrays["X_m"])
    np.testing.assert_array_equal(np.asarray(out["mask"]), arrays["mask"])
    np.testing.assert_array_equal(np.asarray(out["protein_mask"]),
                                  arrays["protein_mask"])
    # delta-coded coords: exact to the 0.01-A quantization (plus f32
    # rounding of x*100 and the 0.01 rescale at |x|~300)
    assert np.max(np.abs(np.asarray(out["X"]) - arrays["X"])) <= 0.00502


def test_repad_length_matches_collate_fills():
    """repad_length must extend a collated batch with the same fill values
    collate_batch writes (PAD tokens, -100 R_idx, -1 chain labels)."""
    import numpy as np
    from na_mpnn_tpu import constants
    from na_mpnn_tpu.train.collate import collate_batch, repad_length

    L, nA = 5, 16
    s = {
        "X": np.ones([L, nA, 3], np.float32),
        "X_m": np.ones([L, nA], np.int32),
        "S": np.zeros([L], np.int64),
        "R_idx": np.arange(L, dtype=np.int32),
        "chain_labels": np.zeros([L], np.int64),
        "protein_mask": np.ones([L], np.int32),
        "dna_mask": np.zeros([L], np.int32),
        "rna_mask": np.zeros([L], np.int32),
        "R_polymer_type": np.zeros([L], np.int64),
    }
    short = collate_batch([s], pad_to=8)
    wide = collate_batch([s], pad_to=16)
    repadded = repad_length(short, 16)
    for k, v in wide.items():
        if isinstance(v, np.ndarray):
            np.testing.assert_array_equal(repadded[k], v, err_msg=k)
    assert int(repadded["S"][0, -1]) == constants.RESTYPE_TO_INT["PAD"]
    assert int(repadded["R_idx"][0, -1]) == -100
    assert repad_length(wide, 16) is wide  # no-op path


def test_packed_feed_layout_pins_prevent_oscillation():
    """Integer widths only widen and zero-skip is one-way, so batches that
    straddle a narrowing threshold reuse ONE layout (no recompile storm)."""
    import numpy as np
    from __graft_entry__ import _synthetic_batch
    from na_mpnn_tpu.models import ModelConfig
    from na_mpnn_tpu.train.trainer import BATCH_KEYS, Trainer

    t = Trainer(ModelConfig(compute_dtype="float32", kernels="xla"), seed=0)
    nb = _synthetic_batch(B=1, L=48)
    arrays = {k: np.asarray(nb[k]) for k in BATCH_KEYS if k in nb}
    small = dict(arrays, R_idx=np.asarray(nb["R_idx"]).clip(0, 200))
    big = dict(arrays, R_idx=np.asarray(nb["R_idx"]) + 40000)
    _, lay_small = t._pack_np_batch(small)
    _, lay_big = t._pack_np_batch(big)
    _, lay_small2 = t._pack_np_batch(small)  # must NOT re-narrow
    assert lay_big == lay_small2
    wire = {e[0]: e[3] for e in lay_small2}
    assert wire["R_idx"] == "int32"
    # unsupported dtype -> graceful (None, None) fallback, not an assert
    bad = dict(arrays, S=arrays["S"].astype(np.int16))
    assert t._pack_np_batch(bad) == (None, None)
