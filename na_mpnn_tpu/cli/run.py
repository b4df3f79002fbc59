"""NA-MPNN inference CLI: sequence design & specificity prediction on TPU.

Drop-in equivalent of the reference CLI (reference inference/run.py:519-556
for flags, :364-516 for outputs): same flag names, same mode defaults
(design: B=1, T=0.1, checkpoint s_19137; specificity: B=30, T=0.6, s_70114 —
reference inference/run.py:559-583), same FASTA / backbone-PDB / specificity
.npz / stats output formats. Accepts reference .pt checkpoints or native
.npz checkpoints.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--model_type", type=str, default="na_mpnn")
    p.add_argument("--checkpoint_na_mpnn", type=str, default=None,
                   help="Path to model weights (.pt or .npz).")
    p.add_argument("--out_folder", type=str, help="Output folder.")
    p.add_argument("--file_ending", type=str, default="")
    p.add_argument("--pdb_path", type=str, default="")
    p.add_argument("--fixed_pos_by_pdb", type=str, default="",
                   help="JSON mapping pdb path -> fixed residues 'A12 A13 ...'")
    p.add_argument("--zero_indexed", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--number_of_batches", type=int, default=1)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--save_stats", type=int, default=0)
    p.add_argument("--chains_to_design", type=str, default=None)
    p.add_argument("--omit_AA", type=str, default="X")
    p.add_argument("--fixed_residues", type=str, default="")
    p.add_argument("--redesigned_residues", type=str, default="")
    p.add_argument("--parse_these_chains_only", type=str, default="")
    p.add_argument("--bias_AA", type=str, default="")
    p.add_argument("--pair_bias_AA", type=str, default="")
    p.add_argument("--symmetry_residues", type=str, default="")
    p.add_argument("--symmetry_weights", type=str, default="")
    p.add_argument("--na_shared_tokens", type=int, default=1)
    p.add_argument("--parse_na_only", type=int, default=0)
    p.add_argument("--design_na_only", type=int, default=0)
    p.add_argument("--k_neighbors", type=int, default=None)
    p.add_argument("--catch_failed_inferences", type=int, default=0)
    p.add_argument("--output_pdbs", type=int, default=1)
    p.add_argument("--output_sequences", type=int, default=1)
    p.add_argument("--output_specificity", type=int, default=0)
    p.add_argument("--load_residues_with_missing_atoms", type=int, default=0)
    p.add_argument("--mode", type=str, default=None,
                   help="design | specificity | score; sets checkpoint/batch/"
                        "temperature defaults. score = teacher-forced "
                        "per-position log-probs of the native sequence under "
                        "random decode orders + unconditional probs, no "
                        "sampling (uses models.score / unconditional_probs, "
                        "role of reference model_utils.py:329-424)")
    p.add_argument("--pad_to_bucket", type=int, default=0,
                   help="Pad each structure to the next multiple of this "
                        "length so different-length inputs share one compiled "
                        "TPU executable (amortizes jit compiles across a "
                        "multi-PDB sweep). 0 disables. Outputs are truncated "
                        "back to the true length.")
    p.add_argument("--stats_format", type=str, default="pt",
                   help="pt (torch, reference-compatible) or npz")
    return p


def apply_mode_defaults(args):
    """Mode defaults (reference inference/run.py:559-583)."""
    if args.checkpoint_na_mpnn is None:
        if args.mode in ("design", "score"):
            args.checkpoint_na_mpnn = "./models/design_model/s_19137.pt"
        elif args.mode == "specificity":
            args.checkpoint_na_mpnn = "./models/specificity_model/s_70114.pt"
        else:
            print("Choose mode from: design, specificity, score")
            sys.exit(1)
    if args.batch_size is None:
        args.batch_size = {"design": 1, "specificity": 30, "score": 10}.get(args.mode)
        if args.batch_size is None:
            print("Choose mode from: design, specificity, score")
            sys.exit(1)
    if args.temperature is None:
        args.temperature = {"design": 0.1, "specificity": 0.6,
                            "score": 0.1}.get(args.mode)
        if args.temperature is None:
            print("Choose mode from: design, specificity, score")
            sys.exit(1)
    if args.mode == "score":
        args.save_stats = 1
    return args


def main(args):
    import jax
    import jax.numpy as jnp

    from .. import constants
    from ..data.featurize import (featurize_inference, get_score, get_seq_rec,
                                  make_pair_bias_ctx)
    from ..data.pdb import parse_pdb, write_backbone_pdb
    from ..models import ModelConfig, sample
    from ..models.mpnn import build_decode_groups, sample_decoding_order, sample_tied
    from ..train.checkpoint import load_params_any

    if args.model_type != "na_mpnn":
        print("Choose --model_type flag from currently available models")
        sys.exit(1)

    from ..data import seq_format

    restype_to_int = constants.restype_to_int_table(bool(args.na_shared_tokens))
    restype_STRtoINT, restype_INTtoSTR, dna_char_to_rna_char = \
        seq_format.token_maps(bool(args.na_shared_tokens))
    num_letters = constants.NUM_LETTERS

    seed = args.seed if args.seed else int(np.random.randint(0, 99999))
    np.random.seed(seed)
    key = jax.random.PRNGKey(seed)

    base_folder = args.out_folder
    if base_folder[-1] != "/":
        base_folder += "/"
    os.makedirs(base_folder, exist_ok=True)
    if args.output_sequences:
        os.makedirs(base_folder + "seqs", exist_ok=True)
    if args.output_pdbs:
        os.makedirs(base_folder + "backbones", exist_ok=True)
    if args.output_specificity:
        os.makedirs(base_folder + "specificity", exist_ok=True)
    if args.save_stats:
        os.makedirs(base_folder + "stats", exist_ok=True)

    k_neighbors = args.k_neighbors if args.k_neighbors is not None else 32
    cfg = ModelConfig(k_neighbors=k_neighbors, dropout=0.0)
    params, _ = load_params_any(args.checkpoint_na_mpnn, cfg)
    params = jax.tree.map(jnp.asarray, params)

    # Token-level biases (reference inference/run.py:205-234).
    bias_AA = seq_format.parse_bias_spec(args.bias_AA, restype_STRtoINT)
    pair_bias_AA = seq_format.parse_pair_bias_spec(args.pair_bias_AA,
                                                   restype_STRtoINT)
    omit_AA = seq_format.omit_vector(args.omit_AA, bool(args.na_shared_tokens))

    if args.fixed_pos_by_pdb:
        with open(args.fixed_pos_by_pdb) as fh:
            fixed_pos_by_pdb = json.load(fh)
    else:
        fixed_pos_by_pdb = {args.pdb_path: args.fixed_residues.split()}

    from ..data.seq_format import structure_name

    for pdb, fixed_residues in fixed_pos_by_pdb.items():
        name = structure_name(pdb)

        parsed = parse_pdb(
            pdb,
            # 'ABCF' (reference form, one letter per chain) or 'AA,BB'
            # (comma-separated, for multi-character mmCIF chain IDs)
            chains=(args.parse_these_chains_only.split(",")
                    if "," in args.parse_these_chains_only
                    else list(args.parse_these_chains_only))
            if args.parse_these_chains_only else None,
            parse_na_only=bool(args.parse_na_only),
            na_shared_tokens=bool(args.na_shared_tokens),
            load_residues_with_missing_atoms=bool(args.load_residues_with_missing_atoms),
        )

        L = len(parsed["S"])
        encoded_residues = [
            f"{parsed['chain_letters'][i]}{parsed['R_idx'][i]}{parsed['icodes'][i]}"
            for i in range(L)
        ]
        encoded_residue_dict = {r: i for i, r in enumerate(encoded_residues)}

        fixed_positions = np.array(
            [int(r not in fixed_residues) for r in encoded_residues], np.int32)
        if args.redesigned_residues:
            redesigned = args.redesigned_residues.split()
            redesigned_positions = np.array(
                [int(r not in redesigned) for r in encoded_residues], np.int32)
        else:
            redesigned_positions = np.zeros_like(fixed_positions)

        if isinstance(args.chains_to_design, str):
            chains_to_design_list = args.chains_to_design.split(",")
        else:
            chains_to_design_list = parsed["chain_letters"]
        if args.design_na_only:
            chains_to_design_list = [c for c in chains_to_design_list
                                     if c in parsed["na_chain_letters"]]
        chain_sel = np.array([c in chains_to_design_list
                              for c in parsed["chain_letters"]], np.int32)
        chain_mask = chain_sel * fixed_positions * (1 - redesigned_positions)

        # Symmetry groups (reference inference/run.py:313-333).
        if args.symmetry_residues:
            sym_lists = [[encoded_residue_dict[t] for t in x.split(",")]
                         for x in args.symmetry_residues.split("|")]
        else:
            sym_lists = [[]]
        if args.symmetry_weights:
            sym_weights = [[float(v) for v in x.split(",")]
                           for x in args.symmetry_weights.split("|")]
        elif args.symmetry_residues:
            sym_weights = [[1.0] * len(x.split(",")) for x in args.symmetry_residues.split("|")]
        else:
            sym_weights = [[]]
        use_symmetry = any(len(s) > 0 for s in sym_lists)

        pad_L = 0
        if args.pad_to_bucket:
            pad_L = -(-L // args.pad_to_bucket) * args.pad_to_bucket
        batch = featurize_inference(parsed, chain_mask, pad_to=pad_L)
        L_run = max(pad_L, L)  # model-side length (padded rows are inert)
        bias = np.tile(-1e8 * omit_AA + bias_AA, (L_run, 1))  # [L_run,nl]
        pair_bias_ctx = None
        if args.pair_bias_AA:
            pair_bias_ctx = make_pair_bias_ctx(
                np.asarray(batch["chain_labels"][0]), np.asarray(batch["R_idx"][0]),
                pair_bias_AA)

        mask_np = np.asarray(batch["mask"][0], np.float32)  # [L_run]
        chain_mask_np = mask_np * np.asarray(batch["chain_mask"][0], np.float32)

        if args.mode == "score":
            # Teacher-forced scoring: batch_size independent random decode
            # orders per batch iteration (one parallel-decoder pass each — no
            # autoregressive scan), plus one unconditional pass.
            from ..models.mpnn import score as score_fn
            from ..models.mpnn import unconditional_probs

            B0 = args.batch_size
            tiled = {k: jnp.repeat(jnp.asarray(v), B0, axis=0)
                     for k, v in batch.items()}
            jit_score = jax.jit(lambda p, b, k: score_fn(p, cfg, b, key=k))
            lp_list, ord_list = [], []
            for _ in range(args.number_of_batches):
                key, sub = jax.random.split(key)
                out = jit_score(params, tiled, sub)
                lp_list.append(np.asarray(out["log_probs"], np.float32))
                ord_list.append(np.asarray(out["decoding_order"]))
            log_probs_stack = np.concatenate(lp_list, 0)      # [N,L_run,nl]
            order_stack = np.concatenate(ord_list, 0)
            uncond = np.asarray(
                jax.jit(lambda p, b: unconditional_probs(p, cfg, b))(
                    params, batch)["log_probs"], np.float32)[0]

            rec_mask = jnp.asarray(chain_mask_np)[None]
            N_total = log_probs_stack.shape[0]
            loss, loss_pr = get_score(
                jnp.repeat(batch["S"][:1], N_total, 0),
                jnp.asarray(log_probs_stack),
                jnp.repeat(rec_mask, N_total, 0), num_letters)
            S_argmax = log_probs_stack.argmax(-1)
            rec_argmax = np.asarray(get_seq_rec(
                batch["S"][:1], jnp.asarray(S_argmax), rec_mask))

            if L_run > L:
                log_probs_stack = log_probs_stack[:, :L]
                uncond = uncond[:L]
                loss_pr = np.asarray(loss_pr)[:, :L]
                order_stack = np.stack(
                    [row[row < L] for row in order_stack.reshape(-1, L_run)]
                ).reshape(order_stack.shape[:-1] + (L,))

            out_dict = {
                "log_probs": log_probs_stack,
                "mean_probs": np.mean(np.exp(log_probs_stack.astype(np.float64)), 0),
                "unconditional_log_probs": uncond,
                "decoding_order": order_stack,
                "native_sequence": np.asarray(batch["S"][0])[:L],
                "loss": np.asarray(loss),
                "loss_per_residue": np.asarray(loss_pr),
                "recovery_argmax": rec_argmax,
                "mask": np.asarray(batch["mask"][0])[:L],
                "chain_mask": np.asarray(batch["chain_mask"][0])[:L],
                "seed": seed,
            }
            stats_path = base_folder + "stats/" + name
            if args.stats_format == "pt":
                import torch
                torch.save({k: (torch.from_numpy(np.asarray(v))
                                if isinstance(v, np.ndarray) else v)
                            for k, v in out_dict.items()}, stats_path + ".pt")
            else:
                np.savez(stats_path + ".npz", **out_dict)
            continue

        S_list, log_probs_list, probs_list, order_list = [], [], [], []
        loss_list, loss_pr_list, loss_XY_list = [], [], []
        for _ in range(args.number_of_batches):
            key, sub = jax.random.split(key)
            if use_symmetry:
                key_order, key_sample = jax.random.split(sub)
                base_order = np.asarray(
                    sample_decoding_order(key_order, jnp.asarray(chain_mask_np)[None]))[0]
                groups, gweights, flat = build_decode_groups(
                    base_order, sym_lists, sym_weights, L_run)
                out = sample_tied(params, cfg, batch, key_sample, groups, gweights,
                                  flat, num_samples=args.batch_size,
                                  temperature=args.temperature,
                                  bias=jnp.asarray(bias),
                                  pair_bias_ctx=pair_bias_ctx)
            else:
                out = sample(params, cfg, batch, sub, num_samples=args.batch_size,
                             temperature=args.temperature, bias=jnp.asarray(bias),
                             pair_bias_ctx=pair_bias_ctx)

            rec_mask = batch["mask"] * batch["chain_mask"]
            loss, loss_per_residue = get_score(out["S"], out["log_probs"],
                                               rec_mask.astype(jnp.float32), num_letters)
            # Deliberate mirror of the reference's vestigial duplicate score
            # (inference/run.py:370-372 computes loss_XY from the identical
            # inputs); kept so saved stats files are field-for-field
            # comparable.
            loss_XY, _ = get_score(out["S"], out["log_probs"],
                                   rec_mask.astype(jnp.float32), num_letters)
            S_list.append(np.asarray(out["S"]))
            log_probs_list.append(np.asarray(out["log_probs"]))
            probs_list.append(np.asarray(out["sampling_probs"]))
            order_list.append(np.asarray(out["decoding_order"]))
            loss_list.append(np.asarray(loss))
            loss_pr_list.append(np.asarray(loss_per_residue))
            loss_XY_list.append(np.asarray(loss_XY))

        S_stack = np.concatenate(S_list, 0)
        log_probs_stack = np.concatenate(log_probs_list, 0)
        sampling_probs_stack = np.concatenate(probs_list, 0)
        decoding_order_stack = np.concatenate(order_list, 0)
        loss_stack = np.concatenate(loss_list, 0)
        loss_per_residue_stack = np.concatenate(loss_pr_list, 0)
        loss_XY_stack = np.concatenate(loss_XY_list, 0)
        rec_stack = np.asarray(get_seq_rec(
            batch["S"][:1], jnp.asarray(S_stack),
            (batch["mask"] * batch["chain_mask"])[:1].astype(jnp.float32)))

        if L_run > L:
            # Drop the inert pad rows from everything user-facing; the
            # decoding order keeps its real-residue entries in decode order.
            S_stack = S_stack[:, :L]
            log_probs_stack = log_probs_stack[:, :L]
            sampling_probs_stack = sampling_probs_stack[:, :L]
            loss_per_residue_stack = loss_per_residue_stack[:, :L]
            decoding_order_stack = np.stack(
                [row[row < L] for row in
                 decoding_order_stack.reshape(-1, L_run)]).reshape(
                     decoding_order_stack.shape[:-1] + (L,))

        S_native = np.asarray(batch["S"][0])[:L]
        rna_conv = np.asarray(batch["rna_mask_for_token_conversion"][0])[:L]

        def ints_to_seq(S_ints):
            return seq_format.ints_to_seq(S_ints, rna_conv, restype_INTtoSTR,
                                          dna_char_to_rna_char)

        def seq_by_chains(seq):
            return seq_format.seq_by_chains(seq, parsed["mask_c"])

        native_seq = ints_to_seq(S_native)

        out_dict = {
            "generated_sequences": S_stack,
            "sampling_probs": sampling_probs_stack,
            "log_probs": log_probs_stack,
            "decoding_order": decoding_order_stack,
            "native_sequence": S_native,
            "mask": np.asarray(batch["mask"][0])[:L],
            "chain_mask": np.asarray(batch["chain_mask"][0])[:L],
            "seed": seed,
            "temperature": args.temperature,
        }
        if args.save_stats:
            stats_path = base_folder + "stats/" + name
            if args.stats_format == "pt":
                import torch
                torch.save({k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
                            for k, v in out_dict.items()}, stats_path + ".pt")
            else:
                np.savez(stats_path + ".npz", **out_dict)

        if args.output_specificity:
            # predicted PPM = mean sampling distribution over all samples
            # (reference inference/run.py:426-443).
            predicted_ppm = np.mean(sampling_probs_stack.astype(np.float64), axis=0)
            specificity_output_dict = {
                "predicted_ppm": predicted_ppm,
                "true_sequence": S_native.astype(np.int64),
                "chain_labels": np.asarray(batch["chain_labels"][0])[:L],
                "mask": np.asarray(batch["mask"][0])[:L],
                "protein_mask": np.asarray(batch["protein_mask"][0])[:L],
                "dna_mask": np.asarray(batch["dna_mask"][0])[:L],
                "rna_mask": np.asarray(batch["rna_mask"][0])[:L],
                "encoded_residues": encoded_residues,
                "encoded_residues_dict": encoded_residue_dict,
                "restype_to_int": restype_to_int,
            }
            np.savez(os.path.join(base_folder, "specificity", name + ".npz"),
                     **specificity_output_dict)

        fasta_entries = [seq_format.native_fasta_entry(
            name, args.temperature, seed, int(np.sum(chain_mask_np)),
            args.batch_size, args.number_of_batches, args.checkpoint_na_mpnn,
            seq_by_chains(native_seq))]
        for ix in range(S_stack.shape[0]):
            ix_suffix = ix if args.zero_indexed else ix + 1
            seq = ints_to_seq(S_stack[ix])

            if args.output_pdbs:
                new_resnames = [constants.RESTYPE_1_TO_3[c] for c in seq]
                bf = loss_per_residue_stack[ix]
                bfactors = np.exp(-bf) * (bf > 0.01).astype(np.float32)
                write_backbone_pdb(
                    base_folder + "backbones/" + name + f"_{ix_suffix}.pdb" + args.file_ending,
                    parsed, new_resnames, bfactors)

            fasta_entries.append(seq_format.sample_fasta_entry(
                name, ix_suffix, args.temperature, seed,
                np.exp(-loss_stack[ix]), rec_stack[ix], seq_by_chains(seq)))

        if args.output_sequences:
            with open(base_folder + "seqs/" + name + ".fa" + args.file_ending, "w") as f:
                f.write("\n".join(fasta_entries))


def cli_entry(argv=None):
    args = build_argparser().parse_args(argv)
    args = apply_mode_defaults(args)
    if not args.catch_failed_inferences:
        main(args)
    else:
        try:
            main(args)
        except Exception as e:  # noqa: BLE001 — mirror reference failure catcher
            base_folder = args.out_folder
            if base_folder[-1] != "/":
                base_folder += "/"
            os.makedirs(base_folder + "failed_inferences", exist_ok=True)
            if args.fixed_pos_by_pdb:
                with open(args.fixed_pos_by_pdb) as fh:
                    fixed_pos_by_pdb = json.load(fh)
            else:
                fixed_pos_by_pdb = {args.pdb_path: []}
            from ..data.seq_format import structure_name
            for pdb in fixed_pos_by_pdb:
                name = structure_name(pdb)
                with open(base_folder + "failed_inferences/" + name + ".txt", "w") as f:
                    f.write(str(e))


if __name__ == "__main__":
    cli_entry()
