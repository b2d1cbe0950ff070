#!/usr/bin/env python3
"""Dev-only: assert every registered query is listed by literal name in
COVERAGE.md. Run after a Verify dump (the dump's oracle_sql.json is the
ground-truth registry):

    python3 tools/audit_coverage.py /tmp/verify_out

Exits 1 listing any unlisted query. Keeps the judge-facing inventory in
sync with the actual registry (r12: three query families had drifted to
shorthand or been missed entirely).
"""
import json, sys
from pathlib import Path

def main():
    dump = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    keys = sorted(json.loads(Path(dump, "oracle_sql.json").read_text()))
    cov = Path(__file__).resolve().parent.parent.joinpath("COVERAGE.md").read_text()
    missing = [k for k in keys if f"`{k}`" not in cov]
    print(f"{len(keys)} registered; {len(missing)} unlisted")
    for k in missing:
        print(f"  MISSING from COVERAGE.md: {k}")
    sys.exit(1 if missing else 0)

if __name__ == "__main__":
    main()
