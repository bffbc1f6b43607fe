"""uvaia-tpu: TPU-native reference-based genome alignment and search.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
quadram-institute-bioscience/uvaia v2.0.2: reference-based WFA-style
alignment, exact nearest-neighbour search over huge aligned databases,
radius search, and canopy clustering — re-designed for TPU hardware
(dense MXU match counting, lax.sort top-k, sharded multi-chip scans).
"""

__version__ = "0.5.0"
