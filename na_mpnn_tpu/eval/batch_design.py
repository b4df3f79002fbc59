"""Batched multi-structure design: many PDBs through one chip in one pass.

The reference designs one structure per process and scales out with Slurm
arrays (200 tasks x 20 min CPU for its 1373-structure design test set;
reference evaluation/evaluation_cmds.txt:104-108, rna_design_scripts/
design_sequences.sh). On TPU the economics invert: one chip decodes a whole
batch of structures at once, and XLA executables are reused across batches.
This driver:

1. parses every input PDB (host side),
2. buckets structures by padded length (``bucket`` granularity — one
   compiled executable per bucket, exactly like ``--pad_to_bucket``),
3. packs up to ``batch_structures`` structures per decode batch, replicating
   each ``samples_per_structure`` times (models.sample_multi),
4. writes the same per-structure ``seqs/<name>.fa`` files as cli/run.

Output FASTA format matches the reference design CLI (inference/run.py:
445-516) so downstream eval pipelines parse it unchanged.

Usage:
    python -m na_mpnn_tpu.eval.batch_design --csv structures.csv \
        --checkpoint model.npz --out_folder out/ --samples 4
"""
from __future__ import annotations

import argparse
import functools
import os
from typing import Dict, List, Optional

import numpy as np


@functools.lru_cache(maxsize=None)
def _jit_sampler(cfg, s_rep: int, temperature: float):
    """Jitted sampler cached across design_structures calls (ModelConfig is
    a frozen dataclass, so it keys the cache); a fresh lambda per call would
    re-trace every time."""
    import jax

    from ..models.mpnn import sample_multi

    return jax.jit(lambda p, b, k, bias: sample_multi(
        p, cfg, b, k, samples_per_structure=s_rep,
        temperature=temperature, bias=bias))


def _chain_mask_for(parsed: Dict, design_na_only: bool) -> np.ndarray:
    chains = parsed["chain_letters"]
    if design_na_only:
        sel = [c in parsed["na_chain_letters"] for c in chains]
    else:
        sel = [True] * len(chains)
    return np.asarray(sel, np.int32)


def _dummy_like(feats: Dict) -> Dict:
    """An all-masked row: zero coords, mask 0 everywhere -> every position is
    teacher-forced and excluded from all losses; pads a group to the fixed
    batch size so the executable is reused."""
    out = {k: np.zeros_like(np.asarray(v)) for k, v in feats.items()}
    # strictly increasing R_idx keeps relative-position math harmless
    out["R_idx"] = np.arange(out["R_idx"].shape[1],
                             dtype=out["R_idx"].dtype)[None]
    return out


def design_structures(pdb_paths: List[str], checkpoint: str, out_folder: str,
                      samples_per_structure: int = 1, temperature: float = 0.1,
                      omit_AA: str = "ARNDCQEGHILKMFPSTWYVX",
                      design_na_only: int = 1, bucket: int = 64,
                      batch_structures: int = 8, seed: int = 0,
                      na_shared_tokens: int = 1,
                      file_ending: str = "") -> Dict[str, Dict]:
    """Design sequences for every structure; returns
    {name: {"seq_rec": [S], "confidence": [S], "fasta_path": str}}.
    """
    import jax
    import jax.numpy as jnp

    from .. import constants
    from ..data.featurize import featurize_inference, get_score, get_seq_rec
    from ..data.pdb import parse_pdb
    from ..models import ModelConfig
    from ..train.checkpoint import load_params_any

    cfg = ModelConfig(dropout=0.0)
    params, _ = load_params_any(checkpoint, cfg)
    params = jax.tree.map(jnp.asarray, params)

    os.makedirs(os.path.join(out_folder, "seqs"), exist_ok=True)

    restype_to_int = constants.restype_to_int_table(bool(na_shared_tokens))
    restype_STRtoINT = {constants.RESTYPE_3_TO_1[k]: v
                        for k, v in restype_to_int.items()}
    restype_INTtoSTR = {}
    for k, v in restype_STRtoINT.items():
        restype_INTtoSTR.setdefault(v, k)
    dna_char_to_rna_char = dict(constants.DNA_CHAR_TO_RNA_CHAR) \
        if na_shared_tokens else {}
    omit_list = omit_AA + ("bdhuy" if na_shared_tokens else "")
    omit = np.array([aa in omit_list for aa in constants.ALPHABET], np.float32)
    nl = constants.NUM_LETTERS

    # Parse everything host-side, bucket by padded length.
    parsed_all = []
    for p in pdb_paths:
        name = os.path.basename(p)
        if name[-4:] in (".pdb", ".cif"):
            name = name[:-4]
        parsed = parse_pdb(p, na_shared_tokens=bool(na_shared_tokens))
        parsed_all.append((name, p, parsed))
    buckets: Dict[int, List] = {}
    for item in parsed_all:
        L = len(item[2]["S"])
        Lp = -(-max(L, 1) // bucket) * bucket
        buckets.setdefault(Lp, []).append(item)

    S_rep = samples_per_structure
    key = jax.random.PRNGKey(seed if seed else int(np.random.randint(0, 99999)))

    jit_sample = _jit_sampler(cfg, S_rep, float(temperature))

    results: Dict[str, Dict] = {}
    for Lp in sorted(buckets):
        items = buckets[Lp]
        bias = jnp.asarray(np.tile(-1e8 * omit, (Lp, 1)))  # [Lp,nl]
        for g0 in range(0, len(items), batch_structures):
            group = items[g0:g0 + batch_structures]
            feats = []
            for name, path, parsed in group:
                cm = _chain_mask_for(parsed, bool(design_na_only))
                # host-side featurization: one device upload per GROUP
                # (per-structure round-trips dominated the wall-clock)
                feats.append(featurize_inference(parsed, cm, pad_to=Lp,
                                                 as_numpy=True))
            while len(feats) < batch_structures:  # fixed-shape executable
                feats.append(_dummy_like(feats[0]))
            batch = {k: jnp.asarray(np.concatenate([f[k] for f in feats]))
                     for k in feats[0]}

            key, sub = jax.random.split(key)
            out = jit_sample(params, batch, sub, bias)

            rec_mask = (batch["mask"] * batch["chain_mask"]).astype(jnp.float32)
            rec_mask_rep = jnp.repeat(rec_mask, S_rep, axis=0)
            S_true_rep = jnp.repeat(batch["S"], S_rep, axis=0)
            rec = np.asarray(get_seq_rec(S_true_rep, out["S"], rec_mask_rep))
            loss, _ = get_score(out["S"], out["log_probs"], rec_mask_rep, nl)
            loss = np.asarray(loss)
            S_all = np.asarray(out["S"])

            for i, (name, path, parsed) in enumerate(group):
                L = len(parsed["S"])
                rna_conv = np.asarray(parsed["rna_mask_for_token_conversion"])

                def ints_to_seq(S_ints):
                    chars = []
                    for t, aa in enumerate(S_ints[:L]):
                        ch = restype_INTtoSTR[int(aa)]
                        if rna_conv[t] == 1:
                            ch = dna_char_to_rna_char.get(ch, ch)
                        chars.append(ch)
                    return "".join(chars)

                def by_chains(seq):
                    arr = np.array(list(seq))
                    return "/".join("".join(arr[m]) for m in parsed["mask_c"])

                native = ints_to_seq(np.asarray(parsed["S"]))
                n_design = int(np.asarray(rec_mask[i][:L]).sum())
                entries = [
                    f">{name}, T={temperature}, seed={seed}, "
                    f"num_res={n_design}, batch_size={S_rep}, "
                    f"number_of_batches=1, model_path={checkpoint}\n"
                    f"{by_chains(native)}"]
                recs, confs = [], []
                for s in range(S_rep):
                    row = i * S_rep + s
                    seq = ints_to_seq(S_all[row])
                    conf = float(np.exp(-loss[row]))
                    recs.append(float(rec[row]))
                    confs.append(conf)
                    entries.append(
                        f">{name}, id={s + 1}, T={temperature}, seed={seed}, "
                        f"overall_confidence="
                        f"{np.format_float_positional(conf, unique=False, precision=4)} "
                        f"seq_rec="
                        f"{np.format_float_positional(rec[row], unique=False, precision=4)}\n"
                        f"{by_chains(seq)}")
                fasta_path = os.path.join(out_folder, "seqs",
                                          name + ".fa" + file_ending)
                with open(fasta_path, "w") as f:
                    f.write("\n".join(entries))
                results[name] = {"seq_rec": recs, "confidence": confs,
                                 "fasta_path": fasta_path}
    return results


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--csv", required=True,
                   help="CSV with a structure_path column")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out_folder", required=True)
    p.add_argument("--samples", type=int, default=1)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--omit_AA", default="ARNDCQEGHILKMFPSTWYVX")
    p.add_argument("--design_na_only", type=int, default=1)
    p.add_argument("--bucket", type=int, default=64)
    p.add_argument("--batch_structures", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import pandas as pd
    paths = list(pd.read_csv(args.csv)["structure_path"])
    res = design_structures(
        paths, args.checkpoint, args.out_folder,
        samples_per_structure=args.samples, temperature=args.temperature,
        omit_AA=args.omit_AA, design_na_only=args.design_na_only,
        bucket=args.bucket, batch_structures=args.batch_structures,
        seed=args.seed)
    for name, r in res.items():
        print(f"{name}: seq_rec={np.mean(r['seq_rec']):.4f} "
              f"confidence={np.mean(r['confidence']):.4f}")


if __name__ == "__main__":
    main()
