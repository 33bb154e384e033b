"""Interpreter-startup protobuf shim for Spark-launched Python workers.

This directory is placed on PYTHONPATH by ``compat.ensure_protobuf`` so
that every Python process the Spark JVM forks (executor workers and the
transformWithState streaming driver worker) repeats the vendored-protobuf
fallback before pyspark's ``*_pb2`` modules import.  No-op when
``google.protobuf`` is already importable.  See ``compat.py`` for the
rationale (namespace-package eviction, minor-version gencode relaxation).

Python imports only the FIRST ``sitecustomize`` found on ``sys.path``;
since this shim occupies that slot it also CHAIN-LOADS the next
``sitecustomize.py`` further down the path, so a user-provided or
site-provided startup hook still runs (matching stdlib ``site`` behavior
of printing, not raising, on a failing hook).
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


def _chain_next_sitecustomize() -> None:
    import importlib.util
    import traceback

    here = os.path.dirname(os.path.abspath(__file__))
    for entry in sys.path:
        d = os.path.abspath(entry) if entry else os.getcwd()
        if d == here:
            continue
        cand = os.path.join(d, "sitecustomize.py")
        if not os.path.isfile(cand):
            continue
        spec = importlib.util.spec_from_file_location("sitecustomize", cand)
        if spec is None or spec.loader is None:
            return
        mod = importlib.util.module_from_spec(spec)
        # register under the canonical name so `import sitecustomize`
        # resolves to the user's hook, not this shim
        sys.modules["sitecustomize"] = mod
        try:
            spec.loader.exec_module(mod)
        except Exception:
            print(f"Error in chained sitecustomize ({cand}):", file=sys.stderr)
            traceback.print_exc()
        return


_ensure()
_chain_next_sitecustomize()
