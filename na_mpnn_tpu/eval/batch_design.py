"""Batched multi-structure inference: many PDBs through one chip in one pass.

The reference designs one structure per process and scales out with Slurm
arrays (200 tasks x 20 min CPU for its 1373-structure design test set;
reference evaluation/evaluation_cmds.txt:104-108, rna_design_scripts/
design_sequences.sh; 288 tasks for the specificity test set, :180-183). On
TPU the economics invert: one chip decodes a whole batch of structures at
once, and XLA executables are reused across batches. This driver:

1. parses every input PDB (host side),
2. buckets structures by padded length (``bucket`` granularity — one
   compiled executable per bucket, exactly like ``--pad_to_bucket``),
3. packs up to ``batch_structures`` structures per decode batch, replicating
   each ``samples_per_structure`` times (models.sample_multi),
4. post-processes per structure:
   * ``design_structures`` writes the same per-structure ``seqs/<name>.fa``
     files as cli/run (reference FASTA format, inference/run.py:445-516);
   * ``predict_specificities`` writes the same ``specificity/<name>.npz``
     (predicted_ppm = mean sampling distribution; inference/run.py:426-443).

Usage:
    python -m na_mpnn_tpu.eval.batch_design --csv structures.csv \
        --checkpoint model.npz --out_folder out/ --samples 4
    python -m na_mpnn_tpu.eval.batch_design --csv structures.csv \
        --checkpoint model.npz --out_folder out/ --mode specificity
"""
from __future__ import annotations

import argparse
import functools
import os
from typing import Callable, Dict, List, Optional

import numpy as np


@functools.lru_cache(maxsize=None)
def _jit_sampler(cfg, s_rep: int, temperature: float, with_pair_bias: bool):
    """Jitted sampler cached across calls (ModelConfig is a frozen dataclass,
    so it keys the cache); a fresh lambda per call would re-trace every
    time. The seq-recovery / CCE-score epilogue is fused into the same
    executable so each decode group costs ONE dispatch (every separate op
    pays the relay's ~3 ms floor)."""
    import jax
    import jax.numpy as jnp

    from .. import constants
    from ..data.featurize import get_score, get_seq_rec
    from ..models.mpnn import sample_multi

    def run(p, b, k, bias, ctx=None):
        out = sample_multi(p, cfg, b, k, samples_per_structure=s_rep,
                           temperature=temperature, bias=bias,
                           pair_bias_ctx=ctx)
        rec_mask = (b["mask"] * b["chain_mask"]).astype(jnp.float32)
        rec_mask_rep = jnp.repeat(rec_mask, s_rep, axis=0)
        S_true_rep = jnp.repeat(b["S"], s_rep, axis=0)
        rec = get_seq_rec(S_true_rep, out["S"], rec_mask_rep)
        loss, _ = get_score(out["S"], out["log_probs"], rec_mask_rep,
                            constants.NUM_LETTERS)
        return out, rec, loss, rec_mask

    if with_pair_bias:
        return jax.jit(run)
    return jax.jit(lambda p, b, k, bias: run(p, b, k, bias))


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


def _run_batched(pdb_paths: List[str], checkpoint: str,
                 per_structure: Callable,
                 samples_per_structure: int, temperature: float,
                 omit_AA: str, design_na_only: int, bucket: int,
                 batch_structures: int, seed: int, na_shared_tokens: int,
                 failed_dir: Optional[str] = None,
                 pair_bias_AA: Optional[np.ndarray] = None):
    """Shared packed-decode driver: parse -> bucket -> pack -> sample_multi,
    then call ``per_structure(name, path, parsed, rows)`` for every input,
    where ``rows`` carries that structure's slice of the decode outputs
    (padded length; callers truncate to the true L):

      S [S,Lp] int, log_probs [S,Lp,nl], sampling_probs [S,Lp,nl],
      seq_rec [S], loss [S], rec_mask [Lp] (mask * chain_mask).

    The host work is pipelined with the device decode: a parse-ahead thread
    feeds structures (in input order) into greedy per-bucket groups, a full
    group is featurized and dispatched immediately, and the previous group's
    outputs are read back and emitted only after the next one is queued —
    so parsing/featurizing group g overlaps the device decode of group g-1.
    Grouping and RNG-key order depend only on the input order, keeping a
    fixed seed reproducible.
    """
    import queue
    import threading

    import jax
    import jax.numpy as jnp

    from ..data.featurize import featurize_inference
    from ..data.pdb import parse_pdb
    from ..models import ModelConfig
    from ..train.checkpoint import load_params_any

    cfg = ModelConfig(dropout=0.0)
    params, _ = load_params_any(checkpoint, cfg)
    params = jax.tree.map(jnp.asarray, params)

    from ..data.seq_format import omit_vector
    omit = omit_vector(omit_AA, bool(na_shared_tokens))

    # Parse-ahead thread: host-side parsing in input order into a bounded
    # queue. A structure that fails to parse is recorded and skipped — the
    # batch-level analog of the reference's --catch_failed_inferences files
    # (inference/run.py:585-617); without failed_dir the error is re-raised
    # on the main thread.
    parse_q: "queue.Queue" = queue.Queue(maxsize=max(2 * batch_structures, 8))
    stop = threading.Event()  # set when the consumer aborts

    def _offer(item) -> bool:
        """put() that gives up when the consumer has stopped reading."""
        while not stop.is_set():
            try:
                parse_q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _parse_worker():
        try:
            from ..data.seq_format import structure_name
            for p in pdb_paths:
                if stop.is_set():
                    return
                name = structure_name(p)
                try:
                    parsed = parse_pdb(p,
                                       na_shared_tokens=bool(na_shared_tokens))
                    if len(parsed["S"]) == 0:
                        raise ValueError("no residues parsed")
                except Exception as e:  # noqa: BLE001 — skip-and-continue
                    if not _offer(("err", name, p, e)):
                        return
                    continue
                if not _offer(("ok", name, p, parsed)):
                    return
        finally:
            _offer(None)  # sentinel even on worker death -> no consumer hang

    threading.Thread(target=_parse_worker, daemon=True,
                     name="na-mpnn-parse-ahead").start()

    S_rep = samples_per_structure
    key = jax.random.PRNGKey(seed)

    jit_sample = _jit_sampler(cfg, S_rep, float(temperature),
                              pair_bias_AA is not None)
    bias_for: Dict[int, "jnp.ndarray"] = {}  # [Lp,nl] omit bias per bucket

    def _dispatch(group, Lp, sub):
        """Featurize + upload + queue the decode for one group; returns the
        state the emit stage needs (device handles stay in flight)."""
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
        if Lp not in bias_for:
            bias_for[Lp] = jnp.asarray(np.tile(-1e8 * omit, (Lp, 1)))
        if pair_bias_AA is not None:
            # per-structure adjacency diagonals at the padded length,
            # built host-side and uploaded once per group
            from ..data.featurize import make_pair_bias_ctx
            u = np.stack([make_pair_bias_ctx(
                f["chain_labels"][0], f["R_idx"][0], pair_bias_AA,
                as_numpy=True)["u_diag"] for f in feats])
            ctx = {"pair_bias_AA": jnp.asarray(pair_bias_AA, jnp.float32),
                   "u_diag": jnp.asarray(u)}
            out, rec, loss, rec_mask = jit_sample(params, batch, sub,
                                                  bias_for[Lp], ctx)
        else:
            out, rec, loss, rec_mask = jit_sample(params, batch, sub,
                                                  bias_for[Lp])
        return (group, out, rec, loss, rec_mask)

    def _emit(state):
        """Read back one in-flight group and hand each structure its rows."""
        group, out, rec, loss, rec_mask = state
        rec = np.asarray(rec)
        loss = np.asarray(loss)
        S_all = np.asarray(out["S"])
        log_probs = np.asarray(out["log_probs"])
        sampling_probs = np.asarray(out["sampling_probs"])
        rec_mask_np = np.asarray(rec_mask)
        for i, (name, path, parsed) in enumerate(group):
            sl = slice(i * S_rep, (i + 1) * S_rep)
            rows = {
                "S": S_all[sl], "log_probs": log_probs[sl],
                "sampling_probs": sampling_probs[sl],
                "seq_rec": rec[sl], "loss": loss[sl],
                "rec_mask": rec_mask_np[i],
            }
            per_structure(name, path, parsed, rows)

    pending: Dict[int, List] = {}  # Lp -> partially-filled group
    inflight = None
    ready: List = []  # full groups as (group, Lp)
    done = False
    try:
        while not done:
            item = parse_q.get()
            if item is None:
                done = True
                # flush partial groups (dict insertion order — deterministic
                # in the input order; a bucket that refills re-enters at the
                # end)
                ready.extend((grp, Lp) for Lp, grp in pending.items())
            elif item[0] == "err":
                _, name, p, e = item
                if failed_dir is None:
                    # NOTE: inputs stream, so structures decoded before this
                    # one hit disk already; the except-path below still emits
                    # the completed in-flight group before re-raising.
                    raise e
                os.makedirs(failed_dir, exist_ok=True)
                with open(os.path.join(failed_dir, name + ".txt"), "w") as f:
                    f.write(f"{p}\n{type(e).__name__}: {e}\n")
            else:
                _, name, p, parsed = item
                L = len(parsed["S"])
                Lp = -(-max(L, 1) // bucket) * bucket
                pending.setdefault(Lp, []).append((name, p, parsed))
                if len(pending[Lp]) == batch_structures:
                    ready.append((pending.pop(Lp), Lp))
            for group, Lp in ready:
                key, sub = jax.random.split(key)
                state = _dispatch(group, Lp, sub)
                # swap BEFORE emitting: if _emit raises, the except path
                # must not re-emit the group it was already emitting
                prev, inflight = inflight, state
                if prev is not None:
                    _emit(prev)
            ready.clear()
        prev, inflight = inflight, None
        if prev is not None:
            _emit(prev)
    except BaseException:
        stop.set()  # unblock + retire the parse worker
        try:  # drain so a worker blocked in put() exits promptly
            while True:
                item = parse_q.get_nowait()
                # queued parse failures still get their failure record
                if item is not None and item[0] == "err" \
                        and failed_dir is not None:
                    _, name, p, e = item
                    try:
                        os.makedirs(failed_dir, exist_ok=True)
                        with open(os.path.join(failed_dir, name + ".txt"),
                                  "w") as f:
                            f.write(f"{p}\n{type(e).__name__}: {e}\n")
                    except OSError:
                        pass
        except queue.Empty:
            pass
        if inflight is not None:  # device work is done — keep its outputs
            try:
                _emit(inflight)
            except Exception:  # noqa: BLE001 — don't mask the original error
                pass
        raise


def design_structures(pdb_paths: List[str], checkpoint: str, out_folder: str,
                      samples_per_structure: int = 1, temperature: float = 0.1,
                      omit_AA: str = "ARNDCQEGHILKMFPSTWYVX",
                      design_na_only: int = 1, bucket: int = 64,
                      batch_structures: int = 8, seed: int = 0,
                      na_shared_tokens: int = 1,
                      file_ending: str = "",
                      catch_failures: bool = False,
                      pair_bias_AA: Optional[np.ndarray] = None,
                      write_design_json: bool = False) -> Dict[str, Dict]:
    """Design sequences for every structure; returns
    {name: {"seq_rec": [S], "confidence": [S], "fasta_path": str}}.
    catch_failures records unparseable inputs under failed_inferences/
    and continues (reference inference/run.py:585-617). Without it an
    invalid input raises as soon as it is parsed; inputs stream through
    the decode pipeline, so structures decoded earlier keep their output
    files (same partial-output property as the reference's per-structure
    fan-out).
    write_design_json additionally emits the per-structure
    <out>/<name>/design_json/<name>_<i>.json dicts the monomer-RNA eval
    pipeline consumes (harness.design_nucleic_acid_sequence contract) —
    batch mode then drop-in replaces the per-structure design stage.
    """
    import json

    from ..data.seq_format import (ints_to_seq, native_fasta_entry,
                                   sample_fasta_entry, seq_by_chains,
                                   token_maps)

    # Resolve seed=0 -> random ONCE so the FASTA headers record the seed
    # that actually drove sampling (cli/run.py does the same).
    seed = int(seed) if seed else int(np.random.randint(1, 99999))

    os.makedirs(os.path.join(out_folder, "seqs"), exist_ok=True)
    _, int_to_str, dna_to_rna = token_maps(bool(na_shared_tokens))

    results: Dict[str, Dict] = {}

    def emit(name, path, parsed, rows):
        L = len(parsed["S"])
        rna_conv = np.asarray(parsed["rna_mask_for_token_conversion"])
        S_rep = rows["S"].shape[0]

        def to_seq(S_ints):
            return ints_to_seq(S_ints[:L], rna_conv, int_to_str, dna_to_rna)

        native = to_seq(np.asarray(parsed["S"]))
        n_design = int(rows["rec_mask"][:L].sum())
        entries = [native_fasta_entry(
            name, temperature, seed, n_design, S_rep, 1, checkpoint,
            seq_by_chains(native, parsed["mask_c"]))]
        recs, confs, design_data = [], [], []
        for s in range(S_rep):
            seq_text = seq_by_chains(to_seq(rows["S"][s]), parsed["mask_c"])
            conf = float(np.exp(-rows["loss"][s]))
            rec = float(rows["seq_rec"][s])
            recs.append(rec)
            confs.append(conf)
            entries.append(sample_fasta_entry(
                name, s + 1, temperature, seed, conf, rec, seq_text))
            design_data.append({
                "input_structure_name": name,
                "input_structure_path": path,
                "original_input_structure_path": path,
                "design_id": str(s + 1),
                "name": f"{name}_{s + 1}",
                "design_sequence": seq_text,
                "tool_reported_sequence_recovery": rec,
                "design_method": "na_mpnn",
                "model_weights_path": checkpoint,
            })
        fasta_path = os.path.join(out_folder, "seqs",
                                  name + ".fa" + file_ending)
        with open(fasta_path, "w") as f:
            f.write("\n".join(entries))
        if write_design_json:
            dj = os.path.join(out_folder, name, "design_json")
            os.makedirs(dj, exist_ok=True)
            for d in design_data:
                with open(os.path.join(dj, d["name"] + ".json"), "w") as f:
                    json.dump(d, f, indent=4)
        results[name] = {"seq_rec": recs, "confidence": confs,
                         "fasta_path": fasta_path}

    _run_batched(pdb_paths, checkpoint, emit,
                 samples_per_structure=samples_per_structure,
                 temperature=temperature, omit_AA=omit_AA,
                 design_na_only=design_na_only, bucket=bucket,
                 batch_structures=batch_structures, seed=seed,
                 na_shared_tokens=na_shared_tokens,
                 failed_dir=os.path.join(out_folder, "failed_inferences")
                 if catch_failures else None,
                 pair_bias_AA=pair_bias_AA)
    return results


def predict_specificities(pdb_paths: List[str], checkpoint: str,
                          out_folder: str,
                          samples_per_structure: int = 30,
                          temperature: float = 0.6,
                          omit_AA: str = "ARNDCQEGHILKMFPSTWYVX",
                          design_na_only: int = 1, bucket: int = 64,
                          batch_structures: int = 4, seed: int = 0,
                          na_shared_tokens: int = 1,
                          catch_failures: bool = False,
                          pair_bias_AA: Optional[np.ndarray] = None) -> Dict[str, Dict]:
    """Predict binding-specificity PPMs for every structure in packed decode
    batches; writes the reference CLI's ``specificity/<name>.npz`` payload
    (inference/run.py:426-443 — predicted_ppm = mean over all samples of the
    per-position sampling distribution) and returns
    {name: {"ppm_path": str, "predicted_ppm": [L,num_letters]}}.

    Defaults mirror the specificity-mode CLI (B=30, T=0.6, protein fixed;
    reference inference/run.py:559-583).
    """
    from .. import constants

    seed = int(seed) if seed else int(np.random.randint(1, 99999))

    os.makedirs(os.path.join(out_folder, "specificity"), exist_ok=True)
    restype_to_int = constants.restype_to_int_table(bool(na_shared_tokens))
    results: Dict[str, Dict] = {}

    def emit(name, path, parsed, rows):
        L = len(parsed["S"])
        predicted_ppm = np.mean(
            rows["sampling_probs"][:, :L].astype(np.float64), axis=0)
        encoded_residues = [
            f"{parsed['chain_letters'][i]}{parsed['R_idx'][i]}{parsed['icodes'][i]}"
            for i in range(L)
        ]
        ppm_path = os.path.join(out_folder, "specificity", name + ".npz")
        np.savez(
            ppm_path,
            predicted_ppm=predicted_ppm,
            true_sequence=np.asarray(parsed["S"]).astype(np.int64),
            chain_labels=np.asarray(parsed["chain_labels"])[:L],
            mask=np.asarray(parsed["mask"])[:L],
            protein_mask=np.asarray(parsed["protein_mask"])[:L],
            dna_mask=np.asarray(parsed["dna_mask"])[:L],
            rna_mask=np.asarray(parsed["rna_mask"])[:L],
            encoded_residues=encoded_residues,
            encoded_residues_dict={r: i for i, r in enumerate(encoded_residues)},
            restype_to_int=restype_to_int,
        )
        results[name] = {"ppm_path": ppm_path, "predicted_ppm": predicted_ppm}

    _run_batched(pdb_paths, checkpoint, emit,
                 samples_per_structure=samples_per_structure,
                 temperature=temperature, omit_AA=omit_AA,
                 design_na_only=design_na_only, bucket=bucket,
                 batch_structures=batch_structures, seed=seed,
                 na_shared_tokens=na_shared_tokens,
                 failed_dir=os.path.join(out_folder, "failed_inferences")
                 if catch_failures else None,
                 pair_bias_AA=pair_bias_AA)
    return results


def parse_pair_bias_AA(spec: str, na_shared_tokens: bool = True) -> np.ndarray:
    """'xy:val,...' -> [num_letters,num_letters] neighbor-pair bias matrix
    (same format as the inference CLI --pair_bias_AA)."""
    from ..data.seq_format import parse_pair_bias_spec, token_maps

    str_to_int, _, _ = token_maps(na_shared_tokens)
    return parse_pair_bias_spec(spec, str_to_int)


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--csv", required=True,
                   help="CSV with a structure_path column")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out_folder", required=True)
    p.add_argument("--mode", default="design",
                   choices=["design", "specificity"])
    p.add_argument("--samples", type=int, default=None,
                   help="per-structure samples (default: 1 design / 30 specificity)")
    p.add_argument("--temperature", type=float, default=None,
                   help="default: 0.1 design / 0.6 specificity")
    p.add_argument("--omit_AA", default="ARNDCQEGHILKMFPSTWYVX")
    p.add_argument("--design_na_only", type=int, default=1)
    p.add_argument("--bucket", type=int, default=64)
    p.add_argument("--batch_structures", type=int, default=None,
                   help="structures per decode batch (default: 8 design / 4 specificity)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--catch_failed_inferences", type=int, default=0)
    p.add_argument("--pair_bias_AA", type=str, default="",
                   help='neighbor pair bias, e.g. "at:0.5,cg:-0.3"')
    p.add_argument("--write_design_json", type=int, default=0,
                   help="also emit <out>/<id>/design_json/*.json (the "
                        "monomer-RNA pipeline's per-design input format)")
    args = p.parse_args(argv)

    import pandas as pd
    paths = list(pd.read_csv(args.csv)["structure_path"])
    if args.temperature is not None and args.temperature <= 0:
        p.error("--temperature must be > 0 (sampling divides logits by T)")
    defaults = {"design": (1, 0.1, 8), "specificity": (30, 0.6, 4)}
    n_def, t_def, bs_def = defaults[args.mode]
    kwargs = dict(
        samples_per_structure=args.samples if args.samples is not None
        else n_def,
        temperature=args.temperature if args.temperature is not None
        else t_def,
        omit_AA=args.omit_AA, design_na_only=args.design_na_only,
        bucket=args.bucket,
        batch_structures=args.batch_structures if args.batch_structures
        is not None else bs_def, seed=args.seed,
        catch_failures=bool(args.catch_failed_inferences),
        pair_bias_AA=parse_pair_bias_AA(args.pair_bias_AA)
        if args.pair_bias_AA else None)
    if args.mode == "design":
        res = design_structures(paths, args.checkpoint, args.out_folder,
                                write_design_json=bool(args.write_design_json),
                                **kwargs)
        for name, r in res.items():
            print(f"{name}: seq_rec={np.mean(r['seq_rec']):.4f} "
                  f"confidence={np.mean(r['confidence']):.4f}")
    else:
        res = predict_specificities(paths, args.checkpoint, args.out_folder,
                                    **kwargs)
        for name, r in res.items():
            print(f"{name}: ppm -> {r['ppm_path']}")


if __name__ == "__main__":
    main()
