#!/usr/bin/env python3
"""Dependency-policy guard (role of the reference's
tools/check_python_dependency_policy.py, run by its
python-dependency-guard.yaml workflow): every direct dependency declared in
pyproject.toml — build requirements, runtime dependencies, and extras —
must appear in security/python-direct-deps-allowlist.txt, and no dependency
may be a direct URL/VCS reference. Exits nonzero with the offending names.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

try:
    import tomllib
except ImportError:  # pragma: no cover — py<3.11
    import tomli as tomllib  # type: ignore

REPO_ROOT = Path(__file__).resolve().parents[1]
PYPROJECT = REPO_ROOT / "pyproject.toml"
ALLOWLIST = REPO_ROOT / "security" / "python-direct-deps-allowlist.txt"


def normalize(name: str) -> str:
    return re.sub(r"[-_.]+", "-", name).lower()


def requirement_name(spec: str) -> str:
    m = re.match(r"\s*([A-Za-z0-9][A-Za-z0-9._-]*)", spec)
    if not m:
        raise ValueError(f"unparseable requirement: {spec!r}")
    return normalize(m.group(1))


def is_direct_reference(spec: str) -> bool:
    low = spec.lower()
    return "@" in spec.split(";")[0] and ("://" in low or "git+" in low or
                                          low.split("@", 1)[1].strip().startswith(("git+", "http", "file:")))


def declared_dependencies() -> list[str]:
    data = tomllib.loads(PYPROJECT.read_text())
    specs: list[str] = []
    specs += data.get("build-system", {}).get("requires", [])
    project = data.get("project", {})
    specs += project.get("dependencies", [])
    for extra in project.get("optional-dependencies", {}).values():
        specs += extra
    return specs


def main() -> int:
    allow = {
        normalize(line.strip())
        for line in ALLOWLIST.read_text().splitlines()
        if line.strip() and not line.strip().startswith("#")
    }
    errors = []
    for spec in declared_dependencies():
        if is_direct_reference(spec):
            errors.append(f"direct URL/VCS reference not allowed: {spec}")
            continue
        name = requirement_name(spec)
        if name not in allow:
            errors.append(
                f"dependency {name!r} ({spec}) is not in {ALLOWLIST.relative_to(REPO_ROOT)}"
            )
    if errors:
        print("Dependency policy violations:", file=sys.stderr)
        for e in errors:
            print(f"  - {e}", file=sys.stderr)
        return 1
    print(f"dependency policy OK ({len(declared_dependencies())} specs checked)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
