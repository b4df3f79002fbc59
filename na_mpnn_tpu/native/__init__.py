"""Native C++ helpers; built on demand by ``na_mpnn_tpu.data.native_loader``."""
