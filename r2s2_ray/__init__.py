"""r2s2_ray: Ray-Data-native knowledge-graph construction engine (see README.md)."""

import os as _os

# Cap polars' per-process rayon pool BEFORE polars is first imported anywhere in
# this package. Ray already parallelizes across tasks/workers; without this every
# Ray worker spins up an all-cores polars pool (N tasks x N threads oversubscribes
# the node quadratically — measured ~4x wall-time blowup on the fold stage).
# Ray caps OMP_NUM_THREADS for numpy the same way; polars only reads its own var.
_os.environ.setdefault("POLARS_MAX_THREADS", "2")


def _patch_ray_fsspec_import_race() -> None:
    """Ray's ``_is_http_filesystem`` only catches ModuleNotFoundError around its
    lazy ``fsspec.implementations.http`` import. That import always fails here
    (no aiohttp), and a FAILED import is not cached — so two threads creating
    Datasets/datasinks concurrently can race the partial import and surface a
    plain ImportError instead. Wrap it so any ImportError means "not HTTP"."""
    try:
        from ray.data.datasource import path_util

        orig = path_util._is_http_filesystem

        def safe(fs):
            try:
                return orig(fs)
            except ImportError:
                return False

        if getattr(path_util._is_http_filesystem, "__name__", "") != "safe":
            path_util._is_http_filesystem = safe
    except Exception:
        pass


_patch_ray_fsspec_import_race()
