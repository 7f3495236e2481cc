"""Multi-device parallel strategies: mesh construction + shard_map encode
programs (frame-parallel, slice-band). See parallel/mesh.py."""

from .mesh import make_mesh, frame_parallel_fn, band_parallel_fn  # noqa: F401
