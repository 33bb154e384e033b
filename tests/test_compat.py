"""The _pbshim sitecustomize: protobuf fallback must not swallow a
user-provided sitecustomize further down sys.path (Python imports only
the first one found)."""

from __future__ import annotations

import os
import subprocess
import sys

_SHIM_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "duplicate_image_detector_spark",
    "_pbshim",
)


def test_sitecustomize_chains_user_hook(tmp_path):
    user_dir = tmp_path / "userpath"
    user_dir.mkdir()
    (user_dir / "sitecustomize.py").write_text(
        "import os\nos.environ['USER_HOOK_RAN'] = '1'\nMARK = 'user'\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([_SHIM_DIR, str(user_dir)])
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import os, sitecustomize; "
            "print(os.environ.get('USER_HOOK_RAN'), "
            "getattr(sitecustomize, 'MARK', None))",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    # the user hook executed AND `import sitecustomize` resolves to it
    assert out.stdout.split() == ["1", "user"]


def test_sitecustomize_user_hook_error_is_printed_not_fatal(tmp_path):
    user_dir = tmp_path / "userpath"
    user_dir.mkdir()
    (user_dir / "sitecustomize.py").write_text("raise RuntimeError('boom')\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([_SHIM_DIR, str(user_dir)])
    out = subprocess.run(
        [sys.executable, "-c", "print('alive')"],
        env=env,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0
    assert "alive" in out.stdout
    assert "boom" in out.stderr  # surfaced, matching stdlib site behavior
