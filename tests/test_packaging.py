"""spark-submit --py-files packaging stays importable (north-rule delivery).

Builds dist/loongcollector_spark.zip fresh and imports the package from the
zip in a clean subprocess — the exact path an executor takes when the job
ships with --py-files. Catches a module added without .py extension rules,
a zip-unsafe import (e.g. __file__-relative data loading), or a stale dist.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_package_builds_and_imports():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_package.py")],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("loongcollector_spark.zip") and os.path.exists(zip_path)

    probe = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import loongcollector_spark.queries as q\n"
        "import loongcollector_spark.operators.grok as g\n"
        "import loongcollector_spark.config as c\n"
        "assert q.__file__.startswith(sys.argv[1]), q.__file__\n"
        "assert len(q.QUERIES) >= 68\n"
        "assert len(g.BUILTIN_PATTERNS) >= 180\n"
        "print('ok', len(q.QUERIES))\n"
    )
    # clean subprocess: the repo dir must NOT be on sys.path so the zip is
    # the only import source (cwd=/ keeps '' from resolving to the repo)
    res = subprocess.run(
        [sys.executable, "-c", probe, zip_path],
        capture_output=True, text=True, cwd="/",
    )
    assert res.returncode == 0, res.stderr
    assert res.stdout.startswith("ok")
