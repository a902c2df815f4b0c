"""Scale-out: device meshes, batch/head sharding, multi-seed sweeps.

The reference is single-process single-device (SURVEY.md §2 rows 12-14);
this package supplies the TPU-native scaling story: ``jax.sharding.Mesh`` +
``NamedSharding`` with XLA collectives over ICI — no hand-written comm layer.
"""

from vae_connexe_tpu.parallel.mesh import (
    batch_sharding,
    head_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from vae_connexe_tpu.parallel.multihost import initialize_multihost
from vae_connexe_tpu.parallel.seed_sweep import make_sweep_fn, sweep_phase1
from vae_connexe_tpu.parallel.serve import make_sharded_generator
from vae_connexe_tpu.parallel.seq_parallel import (
    seq_sharded_gru,
    seq_sharded_gru_heads,
)

__all__ = [
    "batch_sharding",
    "head_sharding",
    "initialize_multihost",
    "make_mesh",
    "make_sharded_generator",
    "replicated",
    "seq_sharded_gru",
    "seq_sharded_gru_heads",
    "shard_batch",
    "make_sweep_fn",
    "sweep_phase1",
]
