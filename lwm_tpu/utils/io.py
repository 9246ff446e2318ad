"""GCS-transparent file IO (replaces tux.open_file / load_pickle / check_exists).

Local paths use plain builtins; ``gs://`` paths go through gcsfs when
available. All heavier deps are imported lazily so the core package works in
hermetic test environments.
"""

from __future__ import annotations

import os
import pickle


def _is_gcs(path: str) -> bool:
    return isinstance(path, str) and path.startswith("gs://")


def open_file(path, mode="rb", block_size=2**20, cache_type="readahead"):
    if _is_gcs(path):
        import gcsfs

        return gcsfs.GCSFileSystem().open(path, mode, block_size=block_size, cache_type=cache_type)
    return open(path, mode)


def makedirs(path, exist_ok=True):
    if _is_gcs(path):
        return  # GCS has no directories
    os.makedirs(path, exist_ok=exist_ok)


def check_exists(path) -> bool:
    if _is_gcs(path):
        import gcsfs

        return gcsfs.GCSFileSystem().exists(path)
    return os.path.exists(path)


def save_pickle(obj, path):
    with open_file(path, "wb") as fout:
        pickle.dump(obj, fout)


def load_pickle(path):
    with open_file(path, "rb") as fin:
        return pickle.load(fin)
