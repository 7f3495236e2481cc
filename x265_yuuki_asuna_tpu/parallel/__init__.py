"""Multi-device parallel strategies: mesh construction + shard_map encode
programs (frame-parallel, slice-band). See parallel/mesh.py."""

from .mesh import make_mesh, frame_parallel_fn, band_parallel_fn  # noqa: F401
from .pipeline import (frame_pipeline_fn,  # noqa: F401
                       frame_pipeline_stream_fn)
