#!/usr/bin/env python3
"""Diff graft's document read-API output (graft.tools.DocsDump)
against the reference engine's own retrieve() JSON
(reference_oracle.py docs_*.json) on identical fixture input.

Representation normalizations (not semantics):
 - missing object keys == null (Spark's to_json omits null fields;
   after normalization, null-valued keys are dropped on BOTH sides)
 - datetimes: graft emits the API's "YYYY/MM/DD[ HH:MM:SS]", the
   reference returns the ISO text the oracle stored -> both
   canonicalized to "YYYY-MM-DD[ HH:MM:SS]"
 - integral floats -> int

Documented reference read-API divergences (reference bug or lossy
read path -- graft implements the API's evident intent, verified
against the raw fixture documents; SURVEY §7.4.6 / R3):
 1. customized_items come back as JSON-encoded STRINGS (the
    JSON_GROUP_ARRAY at _customized_items.py:235 embeds the TEXT
    item_json without json()) -> parsed before comparison.
 2. customized_items[].table is rebuilt from the hardcoded
    `td.customized_item_id = 1` (_customized_items.py:222), i.e.
    every item gets item #1's table -> `table` excluded on both
    sides (graft's correctly-correlated rebuild is oracle-verified
    separately by query r3).
 3. customized_items[].files and default_attachment_files carry only
    {id,name,type} (_customized_items.py:188-199,
    _default_attachment_files.py:79-83); the API document (and
    graft) carry the full 6-field file object -> graft's files
    projected to the reference's keys.
 4. customized_items[].generic_master is emitted as an all-null
    object when the item has none (LEFT JOIN + unconditional
    JSON_OBJECT); the API (and graft) emit null -> the all-null
    object normalizes to null.
 5. approvers[].approver_code is never stored by the reference
    writer (_approval_process.py:58-72) so retrieve() omits it; the
    API (and graft) carry it -> dropped from graft's side.
 6. SQLite aggregates child arrays in scan order where the read SQL
    has no effective ORDER BY (comments, step files,
    GROUP_CONCAT(DISTINCT) in users, custom_journal_item_list);
    graft pins a deterministic sort -> those arrays are sorted on
    both sides before comparison.
 7. viewers[].group is emitted by the reference read as its storage
    column name `group_name` (_viewers.py:29-34); the API (and
    graft) use `group` -> the reference key is renamed back.

Usage: compare_docs.py <refDir> <graftDir>
"""
import json
import re
import sys
from pathlib import Path

DT = re.compile(
    r"^(\d{4})[/-](\d{2})[/-](\d{2})([T ](\d{2}:\d{2}:\d{2}))?(\.\d+)?"
    r"(Z|[+-]\d{2}:?\d{2})?$")

# array paths with no deterministic order in the reference read SQL
# (divergence 6). Path elements: dict keys; '*' matches a list index.
UNORDERED = [
    ("detail", "approval_process", "steps", "*", "comments"),
    ("detail", "approval_process", "steps", "*", "files"),
    ("detail", "approval_process", "after_completion", "comments"),
    ("detail", "approval_process", "after_completion", "files"),
    ("detail", "customized_items", "*", "files"),
    ("detail", "default_attachment_files"),
    ("user_groups",),
    ("user_positions",),
    ("custom_journal_item_list",),
]


def path_matches(path, pattern):
    if len(path) != len(pattern):
        return False
    return all(p == q or q == "*" for p, q in zip(path, pattern))


def is_unordered(path):
    return any(path_matches(path, u) for u in UNORDERED)


def leaf(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and v.is_integer():
        return int(v)
    if isinstance(v, str):
        m = DT.match(v)
        if m:
            d = f"{m.group(1)}-{m.group(2)}-{m.group(3)}"
            return d + (" " + m.group(5) if m.group(5) else "")
    return v


def norm(v, path=()):
    """Canonicalize: normalize leaves, drop null-valued dict keys,
    sort arrays at documented scan-order paths."""
    if isinstance(v, dict):
        out = {}
        for k, x in v.items():
            nx = norm(x, path + (k,))
            if nx is not None:
                out[k] = nx
        return out
    if isinstance(v, list):
        items = [norm(x, path + ("*",)) for x in v]
        if is_unordered(path):
            items = sorted(items, key=lambda x: json.dumps(
                x, ensure_ascii=False, sort_keys=True))
        return items
    return leaf(v)


def scrub_request_common(doc):
    """Divergence 2: drop customized_items[].table on both sides."""
    for ci in doc.get("detail", {}).get("customized_items") or []:
        ci.pop("table", None)
    return doc


def prep_ref_request(doc):
    det = doc.get("detail") or {}
    # divergence 1: parse the stringified items
    cis = det.get("customized_items")
    if cis is not None:
        det["customized_items"] = [
            json.loads(ci) if isinstance(ci, str) else ci for ci in cis]
    # divergence 4: all-null generic_master object -> null
    for ci in det.get("customized_items") or []:
        gm = ci.get("generic_master")
        if isinstance(gm, dict) and gm.get("record_name") is None \
                and gm.get("record_code") is None \
                and not gm.get("additional_items"):
            ci["generic_master"] = None
    # divergence 7: viewers group_name -> the API's `group`
    for v in det.get("viewers") or []:
        if "group_name" in v:
            v["group"] = v.pop("group_name")
    return scrub_request_common(doc)


def prep_graft_request(doc):
    det = doc.get("detail") or {}
    # divergence 3: project files inside customized_items to the
    # reference's {id,name,type}
    for ci in det.get("customized_items") or []:
        if "files" in ci:
            ci["files"] = [{k: f.get(k) for k in ("id", "name", "type")}
                           for f in ci["files"]]
    if det.get("default_attachment_files"):
        det["default_attachment_files"] = [
            {k: f.get(k) for k in ("id", "name", "type")}
            for f in det["default_attachment_files"]]
    # divergence 5: drop approver_code (reference never stores it)
    ap = det.get("approval_process") or {}
    for step in ap.get("steps") or []:
        for a in step.get("approvers") or []:
            a.pop("approver_code", None)
    return scrub_request_common(doc)


def diff_one(name, ref_doc, graft_doc, fails):
    r = json.dumps(ref_doc, ensure_ascii=False, sort_keys=True, indent=1)
    g = json.dumps(graft_doc, ensure_ascii=False, sort_keys=True, indent=1)
    if r == g:
        return True
    rl, gl = r.splitlines(), g.splitlines()
    for i, (a, b) in enumerate(zip(rl, gl)):
        if a != b:
            ctx = "\n".join(rl[max(0, i - 2):i])
            fails.append(f"{name}: first diff at line {i}\n{ctx}\n"
                         f"  ref:   {a.strip()[:200]}\n"
                         f"  graft: {b.strip()[:200]}")
            return False
    fails.append(f"{name}: length mismatch ref={len(rl)} graft={len(gl)}"
                 f" (tail: ref={rl[len(gl):len(gl)+1]}"
                 f" graft={gl[len(rl):len(rl)+1]})")
    return False


def main():
    ref_dir, graft_dir = Path(sys.argv[1]), Path(sys.argv[2])
    n_pass = n_fail = 0
    fails = []

    # ---- requests: {id: doc} on both sides --------------------------
    ref_req = json.loads((ref_dir / "docs_requests.json").read_text())
    g_req = json.loads((graft_dir / "docs_requests.json").read_text())
    if set(ref_req) != set(g_req):
        fails.append(f"requests id sets differ: ref-only="
                     f"{sorted(set(ref_req) - set(g_req))} graft-only="
                     f"{sorted(set(g_req) - set(ref_req))}")
        n_fail += 1
    for rid in sorted(set(ref_req) & set(g_req)):
        r = norm(prep_ref_request(ref_req[rid]))
        g = norm(prep_graft_request(g_req[rid]))
        if diff_one(f"request {rid}", r, g, fails):
            n_pass += 1
        else:
            n_fail += 1

    # ---- users / fix_journals: lists keyed by id ---------------------
    for fname, key in (("docs_users.json", "id"),
                       ("docs_fix_journals.json", "journal_id")):
        ref_docs = {d[key]: d for d in
                    json.loads((ref_dir / fname).read_text())}
        g_docs = {d[key]: d for d in
                  json.loads((graft_dir / fname).read_text())}
        if set(ref_docs) != set(g_docs):
            fails.append(f"{fname} id sets differ: "
                         f"ref-only={sorted(set(ref_docs) - set(g_docs))} "
                         f"graft-only={sorted(set(g_docs) - set(ref_docs))}")
            n_fail += 1
        for did in sorted(set(ref_docs) & set(g_docs), key=str):
            r, g = norm(ref_docs[did]), norm(g_docs[did])
            if diff_one(f"{fname} {did}", r, g, fails):
                n_pass += 1
            else:
                n_fail += 1

    for f in fails:
        print("DIFF", f)
    print(f"docs: {n_pass} match, {n_fail} differ")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
