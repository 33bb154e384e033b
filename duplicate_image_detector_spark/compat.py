"""Environment-capability shims.

``ensure_protobuf`` makes ``google.protobuf`` importable on hosts where the
wheel is not pip-installed but a vendored pure-Python copy ships with some
other locally installed tool (probed via ``_VENDORED_PROTOBUF_DIRS``, or an
explicit ``DEDUP_PROTOBUF_PATH``).  Spark's ``transformWithStateInPandas``
needs protobuf in THREE processes — the driver, the streaming "driver
worker" the JVM forks, and the executor workers — so besides fixing the
current process's ``sys.path`` the shim exports ``PYTHONPATH`` entries
(picked up by every Python process the JVM subsequently launches) pointing
at a ``sitecustomize.py`` that repeats the fix at interpreter startup.

Two environment quirks the shim handles, both observed here:

  * a vendored runtime can trail pyspark's generated ``*_pb2`` gencode by a
    minor version; protobuf's strict gencode<=runtime check then refuses to
    load.  Minor-version wire compatibility holds, so the check is relaxed
    to a no-op — only on the vendored-fallback path, never for a real
    installed protobuf;
  * jars on ``sys.path`` can register an empty ``google`` namespace package
    whose cached ``__path__`` hides a later-appended real location, so any
    partially imported ``google.*`` modules are evicted before retrying.

Must run BEFORE the SparkSession is created (``session.get_spark`` calls it)
or the exported PYTHONPATH never reaches the JVM's worker launcher.
"""

from __future__ import annotations

import os
import sys

# well-known vendored pure-Python protobuf locations (public tooling only)
_VENDORED_PROTOBUF_DIRS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]

_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")


def _evict_google_modules() -> None:
    for name in [
        k for k in list(sys.modules) if k == "google" or k.startswith("google.")
    ]:
        del sys.modules[name]


def _probe_dirs() -> list[str]:
    extra = os.environ.get("DEDUP_PROTOBUF_PATH")
    dirs = [extra] if extra else []
    dirs += _VENDORED_PROTOBUF_DIRS
    return [d for d in dirs if d and os.path.isdir(os.path.join(d, "google"))]


def ensure_protobuf() -> bool:
    """Best-effort: make ``from google.protobuf import descriptor`` work in
    this process AND in Python workers Spark will launch.  Returns whether
    protobuf is usable.  Idempotent; no-op when protobuf is installed."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    for d in _probe_dirs():
        _evict_google_modules()
        if d not in sys.path:
            sys.path.append(d)
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError:
            sys.path.remove(d)
            continue
        try:
            from google.protobuf import runtime_version as _rv

            _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        except ImportError:
            pass  # older vendored copies have no strict check to relax
        _export_worker_pythonpath(d)
        return True
    return False


def _export_worker_pythonpath(vendored_dir: str) -> None:
    """Prepend the sitecustomize shim dir (and this repo's root, so worker
    processes can unpickle our UDF modules) to the inherited PYTHONPATH."""
    os.environ.setdefault("DEDUP_PROTOBUF_PATH", vendored_dir)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wanted = [_SHIM_DIR, repo_root]
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    for w in reversed(wanted):
        if w not in parts:
            parts.insert(0, w)
    os.environ["PYTHONPATH"] = os.pathsep.join(parts)
