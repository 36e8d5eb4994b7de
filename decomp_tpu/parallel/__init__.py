"""Mesh-sharded solvers (SURVEY.md §2b N5/N6 — rebuild-only components).

The reference is single-process/single-device (SURVEY.md §2, "deComP has NO
multi-device parallelism of any kind"); these modules are the TPU-native
scaling layer mandated by BASELINE.json:5,11: factorisations sharded over a
``jax.sharding.Mesh`` via ``shard_map``, with Gram sufficient statistics
allreduced (``psum``) over ICI. No custom transport exists or is needed —
the communication backend IS mesh + PartitionSpecs + XLA collectives
(SURVEY.md §5 'Distributed communication backend').
"""

from decomp_tpu.parallel import dictionary_learning, lasso, nmf
from decomp_tpu.parallel.mesh import (
    make_mesh,
    make_multislice_mesh,
    shard_rows,
)

__all__ = ["nmf", "lasso", "dictionary_learning", "make_mesh",
           "make_multislice_mesh", "shard_rows"]
