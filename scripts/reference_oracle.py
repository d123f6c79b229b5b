#!/usr/bin/env python3
"""Fidelity oracle: run the REFERENCE ENGINE ITSELF (the read-only repo
at /root/reference — its Python update() writers + SQLite executing its
actual create_views.sql) over the shared fixture documents, and dump
each view's rows to JSON for comparison against graft's Views output.

Dev tooling only (driver-side python), not part of the Scala library.
Usage: reference_oracle.py <fixtureDir> <outDir>

Note: SQLite's strftime requires ISO datetimes; the bundled fixtures
use the API's "YYYY/MM/DD HH:MM:SS" shape, so BOTH engines are fed an
ISO-converted copy (the comparison is on identical input).
"""
import json
import re
import sqlite3
import sys
from pathlib import Path

sys.path.insert(0, "/root/reference")

from jobcan_di.database import users as u_io          # noqa: E402
from jobcan_di.database import group as g_io          # noqa: E402
from jobcan_di.database import positions as pos_io    # noqa: E402
from jobcan_di.database import project as prj_io      # noqa: E402
from jobcan_di.database import company as c_io        # noqa: E402
from jobcan_di.database import forms as f_io          # noqa: E402
from jobcan_di.database import fix_journal as fj_io   # noqa: E402
from jobcan_di.database import requests as r_io       # noqa: E402

VIEWS = [
    "view_user_details", "view_user_group_position", "view_groups",
    "view_positions", "view_forms", "view_companies",
    "view_request_details", "view_approval_process",
    "view_expense_specifics", "view_form_items", "view_form_items_by_name",
    "view_request_approval_history",
    'view_立替精算(書式3)', 'view_立替精算(書式3)_明細',
    'view_立替精算・交通費(書式3-3.)', 'view_立替精算・交通費(書式3-3.)_明細',
    'view_支払依頼申請書（書式4-1. 支払・請求書）',
    'view_支払依頼申請書（書式4-2. 社員振込）',
    'view_支払依頼申請書（書式4-3. 窓口・コンビニ払い）',
    'view_支払依頼申請書（書式4-4. 口座振替）',
    'view_支払依頼申請書（書式4-5. コーポレートカード領収書提出）',
]

SLASH_DT = re.compile(r"^(\d{4})/(\d{2})/(\d{2})( \d{2}:\d{2}:\d{2})?$")


def isoize(obj):
    """Convert the API's slash datetimes to ISO so SQLite strftime works
    (both engines receive this same converted input)."""
    if isinstance(obj, dict):
        return {k: isoize(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [isoize(v) for v in obj]
    if isinstance(obj, str):
        m = SLASH_DT.match(obj)
        if m:
            return f"{m.group(1)}-{m.group(2)}-{m.group(3)}" + \
                (m.group(4) or "")
    return obj


def main():
    fixture_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    out_dir.mkdir(parents=True, exist_ok=True)

    def doc(name):
        return isoize(json.loads((fixture_dir / name).read_text()))

    conn = sqlite3.connect(":memory:")
    for mod in (u_io, g_io, pos_io, prj_io, c_io, f_io, fj_io, r_io):
        mod.create_tables(conn)

    u_io.update(conn, doc("user1.json"))
    u_io.update(conn, doc("user2.json"))
    g_io.update(conn, doc("group1.json"))
    pos_io.update(conn, doc("position1.json"))
    prj_io.update(conn, doc("project1.json"))
    c_io.update(conn, doc("company1.json"))
    f_io.update(conn, doc("form1.json"))
    fj_io.update(conn, doc("fix_journal1.json"))
    fj_io.update(conn, doc("fix_journal2.json"))
    fj_io.update(conn, doc("fix_journal3.json"))
    r_io.update(conn, doc("request_sa10.json"))
    r_io.update(conn, doc("request_sa11.json"))
    r_io.update(conn, doc("request_sa12.json"))

    views_sql = Path(
        "/root/reference/jobcan_di/config/create_views.sql").read_text()
    conn.executescript(views_sql)

    for view in VIEWS:
        cur = conn.execute(f'SELECT * FROM "{view}"')
        cols = [d[0] for d in cur.description]
        rows = [dict(zip(cols, r)) for r in cur.fetchall()]
        fn = out_dir / (re.sub(r"[^0-9A-Za-z_]", "_", view) + ".json")
        fn.write_text(json.dumps(rows, ensure_ascii=False, indent=1,
                                 default=str))
        print(f"{view}: {len(rows)} rows -> {fn.name}")

    # ---- document read-API: the reference's own retrieve() JSON ----
    # requests: one nested document per request id
    cursor = conn.cursor()
    req_ids = [r[0] for r in
               conn.execute("SELECT id FROM requests ORDER BY id")]
    req_docs = {rid: r_io.retrieve(cursor, rid) for rid in req_ids}
    (out_dir / "docs_requests.json").write_text(
        json.dumps(req_docs, ensure_ascii=False, indent=1, default=str))
    print(f"docs_requests: {len(req_docs)} documents")
    # users: list of user documents (users.py retrieve)
    user_docs = u_io.retrieve(conn)
    (out_dir / "docs_users.json").write_text(
        json.dumps(user_docs, ensure_ascii=False, indent=1, default=str))
    print(f"docs_users: {len(user_docs)} documents")
    # fix_journals: list of journal documents (fix_journal.py retrieve)
    fj_docs = fj_io.retrieve(conn)
    (out_dir / "docs_fix_journals.json").write_text(
        json.dumps(fj_docs, ensure_ascii=False, indent=1, default=str))
    print(f"docs_fix_journals: {len(fj_docs)} documents")


if __name__ == "__main__":
    main()
