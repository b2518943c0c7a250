"""Mesh construction and data-parallel sharding policy."""

from shotvae_tpu.parallel.mesh import (
    DataParallel,
    make_mesh,
)

__all__ = ["DataParallel", "make_mesh"]
