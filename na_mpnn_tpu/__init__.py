"""NA-MPNN TPU: a TPU-native (JAX/XLA/Pallas) framework for nucleic-acid
sequence design and protein-DNA specificity prediction, feature-complete with
the reference NA-MPNN codebase."""

__version__ = "0.1.0"

from . import constants  # noqa: F401
