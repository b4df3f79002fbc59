"""Device-op attribution for the train step: capture a jax.profiler trace of
a few steps and sum per-op device durations from the trace JSON — the
in-situ complement to the standalone per-kernel probes (which overstate
dispatch: inside one jitted program, kernels run back-to-back).

Usage: python scripts/profile_device_ops.py [--steps 4] [--top 40]
"""
import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_trace_events(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def summarize(events, top=40):
    # Identify device lanes: process names containing TPU/device.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, name in pid_names.items()
                   if re.search(r"TPU|/device|Device", name or "")}
    per_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))  # microseconds
        per_op[name] += dur
        total += dur
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:top]
    return total, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dir", default="/tmp/na_mpnn_profile")
    args = ap.parse_args()

    import jax
    from na_mpnn_tpu.models import ModelConfig
    from na_mpnn_tpu.train.trainer import Trainer
    from __graft_entry__ import _synthetic_batch

    cfg = ModelConfig(dropout=0.1, protein_augment_eps=0.1,
                      dna_augment_eps=0.1, rna_augment_eps=0.1,
                      compute_dtype="bfloat16")
    np_batch = _synthetic_batch(B=8, L=768)
    trainer = Trainer(cfg, seed=0)
    key = jax.random.PRNGKey(0)
    import shutil
    shutil.rmtree(args.dir, ignore_errors=True)
    trainer.profile_steps(np_batch, key, args.dir, n_steps=args.steps)

    events = load_trace_events(args.dir)
    total, rows = summarize(events, args.top)
    print(json.dumps({
        "device_total_ms_per_step": round(total / 1e3 / args.steps, 3),
        "top_ops_ms_per_step": [
            {"op": name[:100], "ms": round(dur / 1e3 / args.steps, 3)}
            for name, dur in rows],
    }, indent=1))


if __name__ == "__main__":
    main()
