"""Staleness-keyed driver-rotation generator (round-7 verdict ask #1).

The driver verifies a bounded prefix of ``queries()`` each round, so
the registry's front ordering IS the verification schedule. The
round-7 verdict found six queries whose implementation was rewritten
AFTER their last driver-green row — correct (replicated locally) but
with a lagging ledger. This tool makes the schedule self-maintaining,
at FUNCTION granularity (the harness and operator modules accrete new
functions every round, so file-level mtimes would flag everything):

  1. Parse every module in ``data_ingest_spark/`` once: top-level
     function/class spans (decorators included — the oracle SQL lives
     in the ``@_q`` decorator) and the identifiers each body
     references, with import-alias resolution (``pf.welch_ttest`` →
     ``extensions.profile:welch_ttest``).
  2. From each registry builder, BFS the static call-graph across the
     package; a referenced name that isn't a resolvable function
     (module constant, star import) falls back to its whole module.
  3. Per-line commit times come from ONE ``git blame`` per file; a
     function's last-touched time is the max over its span.
  4. last_green(q) = max round whose CORRECTNESS_rN.json row is green
     (hash_match; rows_match for oracle-less queries).
     boundary(N) = commit time of the driver's
     ``round N: verdict/advice/correctness/bench`` commit.
     q is STALE iff touched(q) > boundary(last_green(q)) or it was
     never sampled.

Priority emitted to ``data_ingest_spark/harness/rotation.py``:
FORCE_FRONT (verdict-named rewrites), then other stale queries
oldest-ledger-first, then fresh queries oldest-first (regression
re-confirmation), truncated to SLOTS. Anything cut is automatically
fronted next round — its ledger only gets older.

Usage: python tools/staleness.py [--write]
"""

from __future__ import annotations

import ast
import json
import os
import subprocess
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "data_ingest_spark")
SLOTS = 50
# Queries whose implementation was REWRITTEN after the rotation was
# last regenerated; pinned first regardless of the computed order.
# Round 10: the seven round-9 rewrites that shipped AFTER the r9
# rotation was generated and therefore never got a driver-verified row
# (round-9 verdict ask #1), plus this round's own rewrites (appended
# as they land — regenerate after each).
FORCE_FRONT = [
    "x90_fuzzy_join2", "x84_bpe_encode", "x36_bpe_pairs",
    "x21_kmv_distinct", "p2_qc_filters", "p4_training_prep",
    "x137_vocab_coverage",
    # round-10 rewrites: driver-side power iteration (x99), numpy
    # Lloyd assignment + driver-side centroid update (x51/x82/x100
    # family share the operators)
    "x51_kmeans_ivf", "x99_power_pc1", "x82_lloyd_step",
    "x100_ivf_incremental", "x5_ann_topk",
    # r10: conditional-broadcast grid joins (m2), pair repartition
    # (x130; its prefix-table checkpoint was measured-rejected and
    # removed), scrubbed-corpus checkpoint (p3), pair-count-gated
    # scoring repartition (m9)
    "m2_doublets_native", "x130_ppjoin", "p3_curate",
    "m9_integrate_exact",
]
# Ordering-only modules: their edits must not flood the stale set.
# Semantic helpers living in registry (expr_df/events_df/load) are
# tiny and stable; cover them with FORCE_FRONT if they ever change.
EXCLUDE_MODULES = {"data_ingest_spark.harness.registry",
                   "data_ingest_spark.harness.rotation"}


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, capture_output=True,
                          text=True, check=True).stdout.strip()


def module_of(path: str) -> str | None:
    rel = os.path.relpath(os.path.abspath(path), REPO)
    if not rel.startswith("data_ingest_spark") or not rel.endswith(".py"):
        return None
    mod = rel[:-3].replace(os.sep, ".")
    return mod[:-9] if mod.endswith(".__init__") else mod


def path_of(mod: str) -> str | None:
    p = os.path.join(REPO, mod.replace(".", os.sep) + ".py")
    if os.path.exists(p):
        return p
    p = os.path.join(REPO, mod.replace(".", os.sep), "__init__.py")
    return p if os.path.exists(p) else None


class Mod:
    """Static facts about one package module."""

    def __init__(self, mod: str, path: str):
        self.mod, self.path = mod, path
        src = open(path, encoding="utf-8").read()
        tree = ast.parse(src)
        self.n_lines = src.count("\n") + 1
        # name -> (module, name|None): how each local identifier
        # resolves. (m, None) = module alias; (m, f) = imported func.
        self.aliases: dict[str, tuple[str, str | None]] = {}
        # top-level def name -> (first_line, last_line) incl. decorators
        self.defs: dict[str, tuple[int, int]] = {}
        # def name -> referenced identifiers: plain names and
        # (alias, attr) pairs
        self.refs: dict[str, set] = {}
        for node in tree.body:
            self._visit_top(node)

    def _add_import(self, node) -> None:
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith("data_ingest_spark"):
                    self.aliases[(a.asname or a.name).split(".")[0]] = \
                        (a.name, None) if a.asname else (a.name, None)
                    if a.asname:
                        self.aliases[a.asname] = (a.name, None)
        elif isinstance(node, ast.ImportFrom) and node.module:
            m = node.module
            if node.level:
                parts = self.mod.split(".")[: -node.level]
                m = ".".join(parts + [m]) if parts else m
            if not m.startswith("data_ingest_spark"):
                return
            for a in node.names:
                local = a.asname or a.name
                if path_of(f"{m}.{a.name}"):
                    self.aliases[local] = (f"{m}.{a.name}", None)
                else:
                    self.aliases[local] = (m, a.name)

    def _visit_top(self, node) -> None:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            self._add_import(node)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            start = min([node.lineno]
                        + [d.lineno for d in node.decorator_list])
            self.defs[node.name] = (start, node.end_lineno)
            refs: set = set()
            for sub in ast.walk(node):
                if isinstance(sub, ast.Attribute) and \
                        isinstance(sub.value, ast.Name):
                    refs.add((sub.value.id, sub.attr))
                elif isinstance(sub, ast.Name):
                    refs.add(sub.id)
                elif isinstance(sub, (ast.Import, ast.ImportFrom)):
                    # function-local imports: fold into the module
                    # alias table (safe over-approximation)
                    self._add_import(sub)
            self.refs[node.name] = refs


def main() -> int:
    sys.path.insert(0, REPO)
    import inspect

    from data_ingest_spark.harness import registry

    mods: dict[str, Mod] = {}
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                m = module_of(p)
                if m:
                    mods[m] = Mod(m, p)

    # --- per-line commit times: one git blame per file, lazily ---
    blame_cache: dict[str, list[int]] = {}

    def line_times(path: str) -> list[int]:
        rel = os.path.relpath(path, REPO)
        if rel not in blame_cache:
            # -M -C: follow moved/copied lines through refactors (the
            # round-6 registry split) so a file move doesn't reset
            # every line's time and flood the stale set
            out = _git("blame", "-M", "-C", "--line-porcelain",
                       "--", rel)
            times, cur = [], 0
            for line in out.splitlines():
                if line.startswith("committer-time "):
                    cur = int(line.split()[1])
                elif line.startswith("\t"):
                    times.append(cur)
            blame_cache[rel] = times
        return blame_cache[rel]

    def span_time(mod: str, name: str | None) -> int:
        m = mods.get(mod)
        if m is None:
            return 0
        t = line_times(m.path)
        if name is None or name not in m.defs:
            # module preamble only (constants, imports) — not the
            # whole file, which accretes unrelated functions
            covered = [False] * (m.n_lines + 1)
            for a, b in m.defs.values():
                for i in range(a, b + 1):
                    covered[i] = True
            return max((ct for i, ct in enumerate(t, 1)
                        if i <= m.n_lines and not covered[i]),
                       default=0)
        a, b = m.defs[name]
        return max(t[a - 1:b], default=0)

    # --- function-level BFS over the static call-graph ---
    def reach(mod: str, name: str) -> set[tuple[str, str | None]]:
        seen: set[tuple[str, str | None]] = set()
        stack = [(mod, name)]
        while stack:
            cm, cn = stack.pop()
            if (cm, cn) in seen or cm in EXCLUDE_MODULES \
                    or cm not in mods:
                continue
            seen.add((cm, cn))
            if cn is None or cn not in mods[cm].refs:
                continue
            M = mods[cm]
            for ref in M.refs[cn]:
                if isinstance(ref, tuple):     # alias.attr
                    al, attr = ref
                    if al in M.aliases:
                        tm, tn = M.aliases[al]
                        if tn is None:         # module alias
                            tgt = mods.get(tm)
                            if tgt and attr in tgt.defs:
                                stack.append((tm, attr))
                            elif tgt:          # module constant etc.
                                stack.append((tm, None))
                else:                           # plain name
                    if ref in M.defs:
                        stack.append((cm, ref))
                    elif ref in M.aliases:
                        tm, tn = M.aliases[ref]
                        if tn is None:
                            pass                # bare module mention
                        else:
                            tgt = mods.get(tm)
                            if tgt and tn in tgt.defs:
                                stack.append((tm, tn))
                            elif tgt:
                                stack.append((tm, None))
        return seen

    # --- round boundaries & driver ledger ---
    boundary: dict[int, int] = {}
    for line in _git("log", "--format=%H %ct %s").splitlines():
        _sha, ct, msg = line.split(" ", 2)
        if ": verdict/advice/correctness/bench" in msg:
            n = int(msg.split(" ")[1].rstrip(":"))
            boundary.setdefault(n, int(ct))

    last_green: dict[str, int] = {}
    for fn in sorted(os.listdir(REPO)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            n = int(fn[13:-5])
            for q, v in json.load(open(os.path.join(REPO, fn))).items():
                if isinstance(v, dict) and (v.get("hash_match")
                                            or (v.get("rows_match")
                                                and "hash_match" not in v)):
                    last_green[q] = max(last_green.get(q, 0), n)

    order = list(registry.REGISTRY)
    stale, fresh, why = [], [], {}
    for q in order:
        fn = registry.REGISTRY[q][0]
        mod = module_of(inspect.getsourcefile(fn) or "")
        touched = 0
        culprit = None
        if mod:
            for cm, cn in reach(mod, fn.__name__):
                t = span_time(cm, cn)
                if t > touched:
                    touched, culprit = t, (cm, cn)
        lg = last_green.get(q, 0)
        if lg == 0 or touched > boundary.get(lg, 0):
            stale.append((lg, q, touched))
            why[q] = culprit
        else:
            fresh.append((lg, q))

    front = list(FORCE_FRONT)
    # Round-9 policy (round-8 verdict ask #4): after the forced
    # rewrites, fill STRICTLY OLDEST-LEDGER-FIRST across stale and
    # fresh alike — the r2/r3 tail is now three-plus rounds old by age
    # alone and retiring it beats re-confirming merely-reachable
    # staleness (the full 297-query oracle gate replicates locally
    # every round; the driver ledger is what ages). Anything cut by
    # the 50-slot cap re-fronts next round — its ledger only gets
    # older.
    ranked = ([(lg, q) for lg, q, _t in stale]
              + [(lg, q) for lg, q in fresh])
    n_stale = len({q for _lg, q, _t in stale} | set(FORCE_FRONT))
    for lg, q in sorted(ranked, key=lambda t: (t[0], order.index(t[1]))):
        if len(front) >= SLOTS:
            break
        if q not in front:
            front.append(q)
    front = front[:SLOTS]

    print(f"stale: {n_stale} (incl. {len(FORCE_FRONT)} forced), "
          f"slots: {SLOTS}")
    for q in front:
        tag = ""
        if q in why and why[q]:
            tag = f"  <- {why[q][0].split('.')[-1]}:{why[q][1]}"
        print(f"  r{last_green.get(q, 0)}  {q}{tag}")

    if "--write" in sys.argv:
        gen = os.path.join(PKG, "harness", "rotation.py")
        with open(gen, "w", encoding="utf-8") as fh:
            fh.write(
                '"""GENERATED by tools/staleness.py — do not edit.\n\n'
                "Driver-sample priority: this round's forced rewrites "
                "first, then\nstrictly oldest-driver-ledger rows "
                "(stale and fresh alike) — ledger\nage is the debt "
                "being retired. Regenerate after any operator "
                "rewrite:\n\n    python tools/staleness.py --write\n"
                '"""\n\nROUND8_PRIORITY = [\n')
            for q in front:
                fh.write(f"    {q!r},\n")
            fh.write("]\n")
        print(f"wrote {gen}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
