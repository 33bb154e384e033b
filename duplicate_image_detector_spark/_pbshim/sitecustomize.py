"""Interpreter-startup protobuf shim for Spark-launched Python workers.

This directory is placed on PYTHONPATH by ``compat.ensure_protobuf`` so
that every Python process the Spark JVM forks (executor workers and the
transformWithState streaming driver worker) repeats the vendored-protobuf
fallback before pyspark's ``*_pb2`` modules import.  No-op when
``google.protobuf`` is already importable.  See ``compat.py`` for the
rationale (namespace-package eviction, minor-version gencode relaxation).
"""

import os
import sys


def _ensure() -> None:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return
    except ImportError:
        pass
    vendored = os.environ.get("DEDUP_PROTOBUF_PATH")
    if not vendored or not os.path.isdir(os.path.join(vendored, "google")):
        return
    for name in [
        k for k in list(sys.modules) if k == "google" or k.startswith("google.")
    ]:
        del sys.modules[name]
    if vendored not in sys.path:
        sys.path.append(vendored)
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except ImportError:
        pass


_ensure()
