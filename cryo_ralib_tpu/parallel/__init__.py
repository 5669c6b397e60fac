"""Device-mesh data parallelism over the particle axis."""

from .mesh import (  # noqa: F401
    make_mesh,
    pad_to_multiple,
    particle_sharding,
    replicated_sharding,
    shard_stack,
)
