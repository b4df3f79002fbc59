"""Model configuration for NA-MPNN TPU."""
from __future__ import annotations

import dataclasses

from .. import constants


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters of the NA-MPNN network.

    Defaults match the released models (reference design_model.json:35-43,
    inference/run.py:184-197).
    """
    node_features: int = 128
    edge_features: int = 128
    hidden_dim: int = 128
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    k_neighbors: int = 32
    vocab: int = constants.VOCAB_SIZE          # 33
    num_letters: int = constants.NUM_LETTERS   # 33
    num_rbf: int = 16
    num_positional_embeddings: int = 16
    max_relative_feature: int = 32
    dropout: float = 0.1
    # Per-polymer training-time coordinate noise (Å).
    protein_augment_eps: float = 0.0
    dna_augment_eps: float = 0.0
    rna_augment_eps: float = 0.0
    decode_protein_first: bool = False
    na_ref_atom: str = "C1'"
    include_pred_na_N: bool = True
    # Atom table the input X is laid out in: "backbone" (16-atom, used by the
    # released checkpoints) or "all" (65-atom; reference na_run.py:34-41 via
    # ATOMS_TO_LOAD). Named-atom lookups and the edge-in dimension follow it.
    atom_table: str = "backbone"
    num_polytypes: int = constants.NUM_POLYTYPES  # 6
    # Compute dtype for the MPNN trunk ("float32" or "bfloat16"). Parameters
    # and layer-norm statistics stay fp32; bf16 feeds the MXU at 2x rate.
    compute_dtype: str = "float32"
    # Kernel backend: "auto" (Pallas on TPU, XLA elsewhere), "pallas", "xla".
    kernels: str = "auto"
    # RBF featurizer kernel variant: "classed" sorts edges by endpoint
    # polymer class and computes only the populated atom-pair blocks
    # (~4x fewer FLOPs on mixed batches, exact semantics); "dense" runs the
    # full 18x18 pair grid. Pallas paths only.
    rbf_mode: str = "classed"
    # Graph-parallel featurization memory caps for very long graphs
    # (ribosome scale, L >~ 5e4). 0 = one-shot (whole key set / all rows).
    # gp_knn_key_chunk streams the kNN key set in chunks of this size
    # through a running top-k merge (per-shard memory O(Ls*chunk) instead
    # of O(Ls*L)); gp_rbf_row_chunk maps the non-Pallas RBF fallback over
    # query-row chunks so the [rows, K, A^2*num_rbf] block never
    # materializes whole.
    gp_knn_key_chunk: int = 0
    gp_rbf_row_chunk: int = 0
    # Training rematerialization: "none" saves all residuals (~1.2 GB at
    # the 6000-token regime — measured 9% faster per step on-chip than
    # recomputing), "layer" wraps each layer in jax.checkpoint (the
    # reference's per-layer torch checkpoint, na_model_utils.py:606) for
    # memory-tight regimes.
    remat: str = "none"

    @property
    def atom_dict(self):
        return (constants.ATOM_DICT if self.atom_table == "backbone"
                else constants.ALL_ATOM_ORDER)

    @property
    def total_atoms(self) -> int:
        # table atoms + virtual Cb + (optionally) virtual base-N.
        return len(self.atom_dict) + 1 + (1 if self.include_pred_na_N else 0)

    @property
    def edge_in(self) -> int:
        # positional embedding + all-pair-atom RBF block
        return self.num_positional_embeddings + self.num_rbf * self.total_atoms ** 2

    @property
    def node_in(self) -> int:
        return self.num_polytypes

    @property
    def na_ref_atom_idx(self) -> int:
        return self.atom_dict[self.na_ref_atom]
