"""Pallas TPU kernels (experimental).

The production map-update path is XLA (sort-dedup + gated gathers/scatters,
grid/hash.py) — chosen by measurement, not assumption.  This package holds
the Pallas alternatives and the experiments that justified the choice; see
PERFORMANCE.md "Pallas experiment" for the numbers.
"""

from sonar_3d_reconstruction_tpu.pallas.table_kernel import (
    pallas_lookup_accumulate,
    xla_lookup_accumulate,
)

__all__ = ["pallas_lookup_accumulate", "xla_lookup_accumulate"]
