#!/usr/bin/env python3
"""Regenerate the MATERIALIZED-variant entries of oracle_overlay_sf1.json
from a Verify-dumped oracle_sql.json, so the overlay can never desync from
the registered oracles (the one-sided-tweak hazard: a constant like
GraphAlgos.RankUnit changes in the Scala and the hand-copied overlay SQL
silently keeps the old literal).

The five iterative-CTE overlay entries are IDENTICAL SQL with every CTE
marked MATERIALIZED (DuckDB otherwise re-inlines the 6M-row node/edge
union into each iteration). This script derives them mechanically from
the registered SQL; the other overlay entries (the distinct-representative
dedup rewrites) are genuinely different SQL and are left untouched.

Usage: python3 tools/regen_overlay.py <verify_out_dir>/oracle_sql.json
Rewrites tools/oracle_overlay_sf1.json in place; prints a diff summary.
"""
import json, os, re, sys

MATERIALIZED_KEYS = [
    "graph_pagerank", "graph_ppr", "graph_metrics_full",
    "search_completion_extension", "text_chunk_paragraph",
]

# A CTE header is `<name> AS (` at the start of a WITH list entry —
# always preceded by `WITH [RECURSIVE] ` or `,\n` in our generated SQL,
# and never inside a SELECT (no column is aliased `AS (`).
CTE_HEADER = re.compile(r"(^|,\s*\n|WITH\s+(?:RECURSIVE\s+)?)(\s*([A-Za-z_][A-Za-z0-9_]*)(?:\([^)]*\))?\s+AS)\s*\(", re.M)

def _body_span(sql: str, open_paren: int):
    """(start, end) of the parenthesized CTE body starting at sql[open_paren]."""
    depth = 0
    for i in range(open_paren, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return open_paren + 1, i
    return open_paren + 1, len(sql)

def materialize(sql: str) -> str:
    """Mark every NON-recursive CTE MATERIALIZED. A recursive CTE (its
    own name appears in its body) keeps DuckDB's default treatment —
    the deliberate original-overlay choice: materialization is only
    needed to stop DuckDB re-inlining the big base relations into each
    unrolled iteration, and recursive CTEs are a distinct planner path
    we leave untouched."""
    out, last = [], 0
    for m in CTE_HEADER.finditer(sql):
        name = m.group(3)
        body_start, body_end = _body_span(sql, m.end() - 1)
        recursive = re.search(rf"\b{re.escape(name)}\b",
                              sql[body_start:body_end]) is not None
        out.append(sql[last:m.end() - 1])
        out.append("(" if recursive else "MATERIALIZED (")
        last = m.end()
    out.append(sql[last:])
    return "".join(out)

def main(oracle_path: str) -> int:
    overlay_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "oracle_overlay_sf1.json")
    oracle = json.load(open(oracle_path))
    overlay = json.load(open(overlay_path))
    changed = []
    for k in MATERIALIZED_KEYS:
        if k not in oracle:
            print(f"WARN: {k} not in {oracle_path}; skipped")
            continue
        new = materialize(oracle[k])
        if "MATERIALIZED" not in new:
            print(f"WARN: {k}: no CTE found to materialize; skipped")
            continue
        if overlay.get(k) != new:
            changed.append(k)
        overlay[k] = new
    with open(overlay_path, "w") as f:
        json.dump(overlay, f, indent=1)
        f.write("\n")
    print(f"regenerated {len(MATERIALIZED_KEYS)} entries; changed: {changed or 'none'}")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
