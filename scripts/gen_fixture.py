#!/usr/bin/env python3
"""Seeded, structure-preserving fixture randomizer for the
reference-fidelity sweep (dev tooling, driver-side python only).

Starts from the bundled fixture documents and applies seeded mutations
that vary exactly the axes the view layer is sensitive to — child-array
lengths (expense rows, specifics groups, customized items, approval
steps/approvers/comments, custom journal items), null patterns on
fields observed nullable, currency strings, amounts, dates, and free
text — while keeping every join identifier (user/group/position/
project/company codes, form_id, request ids, view_id) fixed so
referential integrity is preserved. Never invents a new object shape:
every cloned element is a mutated copy of one that exists in the
bundled fixtures, so both the reference writers (KeyError on a missing
key) and graft's fixed schemas see well-formed input.

Usage: gen_fixture.py <seed> <outDir>
"""
import copy
import json
import random
import sys
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / \
    "src/main/resources/fixtures"

WORDS = ["精算", "出張", "会議", "備品", "交際費", "研修", "移動",
         "宿泊", "打合せ", "資料", "郵送", "通信", "雑費"]
BREAKDOWNS = ["電車", "タクシー", "バス", "新幹線", "飛行機", "徒歩"]
STEP_NAMES = ["課長承認", "部長承認", "本部長承認", "経理確認",
              "社長決裁"]
APPROVERS = [("佐藤花子", "u002"), ("山本部長", "u003"),
             ("田中太郎", "u001"), ("経理 係", "u009")]


def yen(rng, lo=100, hi=500000):
    return f"{rng.randrange(lo, hi):,} 円"


def slash_dt(rng):
    return (f"2024/{rng.randrange(1, 13):02d}/{rng.randrange(1, 29):02d}"
            f" {rng.randrange(0, 24):02d}:{rng.randrange(0, 60):02d}:00")


def slash_d(rng):
    return f"2024/{rng.randrange(1, 13):02d}/{rng.randrange(1, 29):02d}"


def txt(rng):
    return "".join(rng.sample(WORDS, rng.randrange(1, 3)))


def maybe_null(rng, v, p=0.3):
    return None if rng.random() < p else v


def mutate_expense_row(rng, row, n):
    r = copy.deepcopy(row)
    r["row_number"] = str(n)
    r["use_date"] = slash_d(rng)
    r["amount"] = rng.randrange(100, 50000)
    r["breakdown"] = rng.choice(BREAKDOWNS)
    r["content_description"] = txt(rng)
    r["project_name"] = maybe_null(rng, r.get("project_name"))
    # custom_items: keep or clone the populated shape when present
    if r.get("custom_items"):
        proto = r["custom_items"][0]
        r["custom_items"] = [copy.deepcopy(proto)
                             for _ in range(rng.randrange(0, 3))]
        for ci in r["custom_items"]:
            if isinstance(ci.get("value"), dict):
                ci["value"]["content"] = rng.choice(["あり", "なし"])
                ci["value"]["memo"] = maybe_null(rng, txt(rng), 0.5)
    return r


def mutate_request(rng, doc):
    d = copy.deepcopy(doc)
    d["title"] = txt(rng) + "精算"
    d["applied_date"] = slash_dt(rng)
    d["project_name"] = maybe_null(rng, d.get("project_name"), 0.25)
    d["flow_step_name"] = maybe_null(rng, d.get("flow_step_name"), 0.4)
    d["pay_at"] = maybe_null(rng, slash_dt(rng), 0.5)
    d["final_approval_period"] = maybe_null(rng, slash_dt(rng), 0.6)
    det = d["detail"]

    # customized items: mutate contents; currency strings get fresh
    # thousands-separated amounts; clone table grids when present
    for item in det.get("customized_items") or []:
        if "円" in (item.get("content") or ""):
            item["content"] = yen(rng)
        elif item.get("content") not in (None, "-"):
            item["content"] = rng.choice(["あり", "なし", "確認済",
                                          txt(rng)])
        if item.get("table"):
            proto_cell = item["table"][0][0]
            rows = rng.randrange(1, 4)
            item["table"] = [
                [dict(proto_cell, column_number=c, value=f"v{r}{c}")
                 for c in range(rng.randrange(1, 4))]
                for r in range(rows)]
        if item.get("files"):
            proto = item["files"][0]
            item["files"] = [
                dict(proto, id=f"f{rng.randrange(100)}",
                     name=f"doc{n}.pdf", date=slash_dt(rng))
                for n in range(rng.randrange(0, 3))]

    exp = det.get("expense")
    if exp:
        exp["content_description"] = txt(rng)
        exp["advanced_payment"] = rng.choice([0, 0, rng.randrange(5000)])
        # specifics groups × rows: the child-array axis the 明細 views
        # walk; row_number stays unique per group
        proto_group = copy.deepcopy(exp["specifics"][0])
        groups = []
        for gi in range(rng.randrange(1, 3)):
            g = copy.deepcopy(proto_group)
            g["type"] = rng.choice(["交通費", "宿泊費", "雑費"])
            proto_row = g["rows"][0]
            g["rows"] = [mutate_expense_row(rng, proto_row, i + 1)
                         for i in range(rng.randrange(1, 5))]
            groups.append(g)
        exp["specifics"] = groups
        exp["amount"] = sum(r["amount"] for g in groups
                            for r in g["rows"])
        d["total_amount"] = exp["amount"]

    pay = det.get("payment")
    if pay:
        pay["amount"] = rng.randrange(1000, 900000)
        pay["content_description"] = txt(rng)
        pay["related_request_title"] = maybe_null(
            rng, pay.get("related_request_title"), 0.5)
        d["total_amount"] = pay["amount"]

    # approval process: 1–4 steps, 1–3 approvers each, comments cloned
    # from the populated shape (sa-10 step 0)
    ap = det["approval_process"]
    proto_step = copy.deepcopy(ap["steps"][0])
    done = d["status"] == "completed"
    steps = []
    n_steps = rng.randrange(1, 5)
    for si in range(n_steps):
        s = copy.deepcopy(proto_step)
        s["name"] = STEP_NAMES[si % len(STEP_NAMES)]
        s["condition"] = rng.choice(["all", "any"])
        step_done = done or si < n_steps - 1
        s["status"] = "done" if step_done else "in_progress"
        proto_appr = s["approvers"][0]
        s["approvers"] = []
        for ai in range(rng.randrange(1, 4)):
            a = copy.deepcopy(proto_appr)
            name, code = APPROVERS[(si + ai) % len(APPROVERS)]
            a["approver_name"], a["approver_code"] = name, code
            if step_done:
                a["status"] = "承認済み"
                a["approved_date"] = slash_dt(rng)
            else:
                a["status"] = "未承認"
                a["approved_date"] = None
            if rng.random() < 0.2:
                pn, pc = APPROVERS[(si + ai + 1) % len(APPROVERS)]
                a["proxy_approver_name"], a["proxy_approver_code"] = pn, pc
            s["approvers"].append(a)
        if proto_step.get("comments"):
            proto_c = proto_step["comments"][0]
            s["comments"] = [
                dict(proto_c, user_name=APPROVERS[ci % 4][0],
                     date=slash_dt(rng), text=txt(rng),
                     deleted=rng.random() < 0.15)
                for ci in range(rng.randrange(0, 3))]
        steps.append(s)
    ap["steps"] = steps
    if done:
        d["final_approved_date"] = slash_dt(rng)
    else:
        d["final_approved_date"] = None
    return d


def mutate_user(rng, doc):
    d = copy.deepcopy(doc)
    d["memo"] = rng.choice(["", txt(rng)])
    d["is_approver"] = rng.random() < 0.7
    d["user_role"] = rng.randrange(0, 3)
    # nullable child arrays the diff-delete writers walk
    if rng.random() < 0.25 and d.get("user_bank_account"):
        d["user_bank_account"] = None
    groups = [g for g in (d.get("user_groups") or []) if g is not None]
    if rng.random() < 0.3:
        groups = groups + [None]
    d["user_groups"] = groups
    return d


def mutate_journal(rng, doc):
    d = copy.deepcopy(doc)
    for side in ("debit", "credit"):
        amt = rng.randrange(100, 400000)
        tax = amt // 11
        d[f"{side}_amount"] = amt
        d[f"{side}_tax_amount"] = rng.choice([0, tax])
        d[f"{side}_amount_without_tax"] = amt - d[f"{side}_tax_amount"]
    d["journal_summary"] = txt(rng)
    if d.get("custom_journal_item_list"):
        proto = d["custom_journal_item_list"][0]
        d["custom_journal_item_list"] = [
            dict(proto, key=f"k{i}", value=txt(rng))
            for i in range(rng.randrange(0, 4))]
    d["invoice_registrated_number"] = maybe_null(
        rng, d.get("invoice_registrated_number"), 0.3)
    return d


def main():
    seed, out = int(sys.argv[1]), Path(sys.argv[2])
    rng = random.Random(seed)
    out.mkdir(parents=True, exist_ok=True)
    for f in sorted(SRC.glob("*.json")):
        doc = json.loads(f.read_text())
        if f.name.startswith("request_"):
            doc = mutate_request(rng, doc)
        elif f.name.startswith("user"):
            doc = mutate_user(rng, doc)
        elif f.name.startswith("fix_journal"):
            doc = mutate_journal(rng, doc)
        elif f.name.startswith("group"):
            doc = dict(doc, description=maybe_null(rng, txt(rng), 0.4))
        elif f.name.startswith("position"):
            doc = dict(doc, description=maybe_null(rng, txt(rng), 0.4))
        (out / f.name).write_text(
            json.dumps(doc, ensure_ascii=False, indent=1))
    print(f"seed {seed} -> {out} ({len(list(out.glob('*.json')))} docs)")


if __name__ == "__main__":
    main()
