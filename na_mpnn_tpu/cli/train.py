"""Training CLI: ``python -m na_mpnn_tpu.cli.train config.json``.

Drop-in equivalent of the reference training entry point
(``python na_run.py config.json``; reference na_run.py:18-19) — the JSON
schema is the reference's (design_model.json / specificity_model.json) plus
optional TPU keys:

* ``MESH_DATA_AXIS`` (int): data-parallel mesh size (default: all devices).
* ``SEED`` (int): base PRNG seed.
"""
from __future__ import annotations

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: na-mpnn-train config.json\n\n" + (__doc__ or ""))
        sys.exit(0 if argv else 1)
    from ..train.trainer import run_training
    run_training(argv[0])


if __name__ == "__main__":
    main()
