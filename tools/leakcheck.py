#!/usr/bin/env python3
"""Self-serve leak scan with provenance (ADVICE r5: a bare counter bump in
LEAKCHECK.json is indistinguishable from a re-run — this writer stamps the
scan time and the exact commit scanned).

Usage: python3 tools/leakcheck.py [outfile]   (default LEAKCHECK_SELF.json)

Scans src/ build.sbt project/ for the same probe classes the round artifact
reports: internal imports/packages, internal URLs, cloud-bucket URIs, slack
links, API-key shapes, internal env vars. Exit 1 if any hit.
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

PROBES = {
    "internal-import": r"import\s+(com|net|org)\.(anthropic|anthropics)\b",
    "internal-url": r"https?://[a-z0-9.-]*\b(anthropic|claude)\b[a-z0-9.-]*\.(com|ai|dev)",
    "internal-pkg2": r"\b(claude|anthropic)[-_.](cli|internal|sdk|code)\b",
    "internal-bucket": r"\b(s3|gs|s3a|abfss?)://[a-zA-Z0-9._-]+",
    "slack-link": r"\bslack\.com/archives/|#[a-z0-9-]*claude[a-z0-9-]*\b",
    "api-key": r"\b(sk-[A-Za-z0-9-]{20,}|AKIA[A-Z0-9]{16})\b",
    "axon-env": r"\b[A-Z_]*(ANTHROPIC|CLAUDE)[A-Z_]*=",
}

ROOTS = ["src", "build.sbt", "project", "tools", "README.md", "SURVEY.md"]


def files():
    for r in ROOTS:
        p = Path(r)
        if p.is_file():
            yield p
        elif p.is_dir():
            for f in p.rglob("*"):
                if f.is_file() and f.suffix in {".scala", ".sbt", ".py", ".md", ".conf", ".json"}:
                    yield f


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK_SELF.json"
    hits = {k: [] for k in PROBES}
    for f in files():
        try:
            text = f.read_text(errors="replace")
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for name, pat in PROBES.items():
                if re.search(pat, line):
                    hits[name].append(f"{f}:{i}: {line.strip()[:160]}")
    commit = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                            text=True).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"], capture_output=True,
                           text=True).stdout.strip() != ""
    n = sum(len(v) for v in hits.values())
    doc = {
        "scanned_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": commit + ("-dirty" if dirty else ""),
        "n_hits": n,
        "hits": hits,
    }
    Path(out).write_text(json.dumps(doc, indent=2) + "\n")
    print(f"{out}: {n} hits at {doc['commit']}")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
