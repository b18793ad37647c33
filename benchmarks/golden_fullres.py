"""Full-resolution golden-image lane (VERDICT r3 weak #6 / directive #7).

CI runs the golden suites in half-resolution mode (tests/golden_utils.py)
so a shading regression inside the widened edge-band tolerance could ship
silently.  This runner executes the SAME golden tests with
P3D_GOLDEN_FULLRES=1 — the original full-resolution comparisons against
reference-shipped PNGs — and records the outcome in GOLDEN_FULLRES.json,
the committed per-round artifact.

Run once per round (CPU is fine; ~minutes):
    python -m benchmarks.golden_fullres
"""

from __future__ import annotations

import datetime
import json
import os
import re
import subprocess
import sys

GOLDEN_SUITES = [
    "tests/test_golden_images.py",
    "tests/test_reference_goldens.py",
    "tests/test_cow_texture_goldens.py",
    "tests/test_joined_spheres_goldens.py",
    "tests/test_gltf_cow_golden.py",
    "tests/test_pulsar_goldens.py",
]


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["P3D_GOLDEN_FULLRES"] = "1"
    out = subprocess.run(
        [sys.executable, "-m", "pytest", *GOLDEN_SUITES, "-q",
         "--no-header"],
        capture_output=True, text=True, env=env, cwd=repo,
        timeout=3 * 3600,
    )
    tail = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    m = re.search(r"(\d+) passed", tail)
    passed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", tail)
    failed = int(m.group(1)) if m else 0
    report = {
        "fullres": True,
        "suites": GOLDEN_SUITES,
        "passed": passed,
        "failed": failed,
        "summary": tail,
        "timestamp": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(timespec="seconds"),
    }
    if failed:
        report["failures"] = [
            l for l in out.stdout.splitlines() if l.startswith("FAILED")
        ][:40]
    with open(os.path.join(repo, "GOLDEN_FULLRES.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    return 1 if failed or not passed else 0


if __name__ == "__main__":
    raise SystemExit(main())
