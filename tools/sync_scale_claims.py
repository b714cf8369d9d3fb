"""Regenerate SCALE_NOTES.md's machine-checked 10x-ratio claims table
from a measured BENCH_DETAIL.json artifact (round-8 VERDICT item 1c —
the same cure sync_readme_counts.py applied to count drift: claims
must FOLLOW artifacts via a tool, not hand-edited prose that goes
stale whenever the engine gets faster).

Policy, applied to each headline query's EFFECTIVE ratio (MIN of
the artifact's shipped scale_10x value and any stored re-measure
reps — the same statistic the gate decides on since round 9:
contention only inflates, so the smallest observation is cleanest):

- effective > 2.0  -> the query needs a claim row (margin under the
  gate's 2.5 unclaimed bound); a new row's claim is the effective
  ratio, its why comes from WHYS (or a generic measured-at line).
- existing row     -> re-anchor the claim to the effective ratio
  when they disagree by more than 1.5x in either direction (small
  wobble doesn't churn the table); the original why is preserved
  with a dated re-anchor note.
- effective < 1.6  -> an existing row is DROPPED: the query no
  longer needs a claim and a stale high claim is dead weight.

Usage:
  python tools/sync_scale_claims.py [artifact.json] [--dry-run]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTES = os.path.join(REPO, "SCALE_NOTES.md")

# why-text for queries likely to cross the claim threshold; keyed by
# query name. Everything else gets the generic measured-at line.
WHYS = {
    "q_mahalanobis": (
        "one-pass moments + d^2 driver inverse, Arrow scoring linear "
        "in rows - the scoring pass dominates at 10x"
    ),
    "q_kn_ppl": (
        "KN LM tables are vocab-bounded broadcasts but the bigram "
        "table BUILD grows with observed vocab at 10x; corpus scoring "
        "rides the scan"
    ),
    "q_hard_negatives": (
        "10 anchors broadcast over an unshuffled corpus - scoring "
        "and per-anchor top-k linear in corpus rows"
    ),
    "q_minhash_neardup": (
        "signatures + exact-verify linear in docs/pairs"
    ),
}
GENERIC_WHY = "linear-in-input plan; claim set from the paired 10x tier"



def parse_table(text: str):
    """Return (start_idx, end_idx, rows) where rows is
    [(query, claim, why)] and text[start:end] spans the table's data
    lines (after the '|---|' separator)."""
    m = re.search(r"## Machine-checked 10. ratio claims", text)
    if not m:
        raise SystemExit("claims header not found in SCALE_NOTES.md")
    sep = re.compile(r"^\|---", re.M)
    sep_m = sep.search(text, m.end())
    if not sep_m:
        raise SystemExit("claims table separator not found")
    start = text.index("\n", sep_m.start()) + 1
    rows = []
    pos = start
    row_re = re.compile(r"^\|\s*(q_\w+)\s*\|\s*([0-9.]+)\s*\|\s*(.*?)\s*\|?\s*$")
    for line in text[start:].splitlines(keepends=True):
        mm = row_re.match(line.rstrip("\n"))
        if not mm:
            break
        rows.append((mm.group(1), float(mm.group(2)), mm.group(3)))
        pos += len(line)
    return start, pos, rows


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--dry-run"]
    dry = "--dry-run" in sys.argv[1:]
    artifact_path = args[0] if args else os.path.join(REPO, "BENCH_DETAIL.json")
    detail = json.load(open(artifact_path))
    scale = detail.get("scale_10x") or {}
    if not scale:
        raise SystemExit(f"{artifact_path} has no scale_10x tier")
    remeasured = (detail.get("scale_claims_check") or {}).get(
        "remeasured"
    ) or {}
    effective = {
        q: round(min([r] + list(remeasured.get(q) or [])), 2)
        for q, r in scale.items()
    }
    stamp = dt.date.fromtimestamp(os.path.getmtime(artifact_path))

    text = open(NOTES).read()
    start, end, rows = parse_table(text)
    existing = {q: (c, why) for q, c, why in rows}

    out_rows = []
    changes = []
    for q, c, why in rows:
        eff = effective.get(q)
        if eff is None:
            out_rows.append((q, c, why))  # not in this artifact's set
            continue
        if eff < 1.6:
            changes.append(f"drop   {q}: claim {c} -> (effective {eff})")
            continue
        # DOWNWARD only: the engine getting faster re-anchors the
        # claim; a claim drifting UP is either contention (the
        # re-measure gate handles it) or a real regression (which
        # must red the gate and be investigated, not silently
        # re-anchored away — that would be claim laundering).
        if eff < c and c / eff > 1.5:
            # strip the previous tag WHEREVER it sits — hand edits
            # sometimes append prose after it, and an end-anchored
            # strip would stack a second tag instead of replacing
            why = re.sub(r"\s*\[re-anchored.*?\]", "", why).strip()
            why = f"{why} [re-anchored {stamp} tool: min {eff}]"
            changes.append(f"anchor {q}: claim {c} -> {eff}")
            c = eff
        elif eff > c * 1.5:
            changes.append(
                f"KEEP   {q}: claim {c} vs effective {eff} — upward "
                "re-anchor requires investigation, not automation"
            )
        out_rows.append((q, c, why))
    for q, eff in sorted(effective.items()):
        if q in existing or eff <= 2.0:
            continue
        why = WHYS.get(q, GENERIC_WHY) + f" [added {stamp} tool: min {eff}]"
        out_rows.append((q, eff, why))
        changes.append(f"add    {q}: claim {eff}")

    body = "".join(f"| {q} | {c} | {w} |\n" for q, c, w in out_rows)
    new_text = text[:start] + body + text[end:]
    for ch in changes:
        print(ch)
    if not changes:
        print("claims table already in sync")
    if not dry and new_text != text:
        open(NOTES, "w").write(new_text)
        print(f"SCALE_NOTES.md updated: {len(out_rows)} claim rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
