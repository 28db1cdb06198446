"""Generate the `_VERIFY_FIRST` rotation order by construction.

The round driver verifies only the FIRST 50 entries of the query
registry, so the ordering must put (1) every query whose implementation
— decorator, body, or any transitively-called package helper — changed
since the last driver-verified snapshot, and every query with no green
row yet, at the head; then (2) everything else oldest-green-first, so
stale greens rotate through the window before they can silently rot on
regenerated testdata.  Round 5's list was exactly right by discipline;
this script makes it right by construction.

How "changed" is decided: for every registered query the script builds
the transitive AST closure — the query's FunctionDef (decorator list
included, which covers the oracle SQL and its f-string constant
references), every module-level constant it references, and every
package-local function it calls, followed recursively across modules
via the import graph (`operators/`, `functions/`, `streaming/`,
`pipeline`, `session`, the queries modules themselves).  The closure's
`ast.dump` digest is compared between the working tree and the BASELINE
git commit (the driver's latest `round N: verdict/...` bookkeeping
commit, which snapshots the bodies the last correctness run actually
checked).  Never-seen or changed => head.

Staleness comes from `CORRECTNESS_r*.json`: a query's latest green
round.  The protocol's soundness invariant — a changed query must be
driver-verified in the SAME round it changed, or the next round's
baseline diff can no longer see the change — is checked explicitly:
the script fails loudly if the head outgrows the window.

Usage (repo root):

    python scripts/gen_verify_order.py            # prints the list block
    python scripts/gen_verify_order.py --names    # one name per line
"""

from __future__ import annotations

import ast
import glob
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "confluent_kafka_streams_examples_spark"
WINDOW = 50

#: the Spark conf block IS behavior (timezone, broadcast threshold, AQE
#: flags change results and plans) but queries never call get_spark —
#: they receive a live session and call load_table — so session.py's
#: conf code is invisible to every query's own AST closure.  It is
#: folded into every digest as a global salt instead (VERDICT r9 #1).
#:
#: load_table joined the salt in r12: it is the one helper EVERY query
#: calls, so a per-closure treatment of an edit there flips all 138
#: queries to "changed" at once — more than the 50-entry window can
#: verify in a round, which the soundness abort correctly rejects.
#: The situation is identical in kind to a get_spark conf edit (one
#: change invalidates the whole registry), so it takes the identical
#: remedy: the closure walk STOPS at load_table (queries no longer
#: embed its body), and load_table's own transitive closure is folded
#: into the global salt — any edit there starts a new epoch and the
#: band rotation re-verifies the registry across following rounds.
SESSION_REL = f"{PKG}/session.py"
SALT_FUNCS = ("get_spark", "load_table")
#: committed salt-epoch record: {"salt": <hex>, "epoch_round": N}.
#: A conf change invalidates ALL greens at once — far more than the
#: 50-entry window can re-verify in one round — so instead of head
#: placement (which would trip the soundness abort) the change starts a
#: new EPOCH: every green older than epoch_round ranks as stale-0 and
#: the stratified band rotates the full registry through the next
#: ceil(N/WINDOW) rounds.  The epoch lives in a committed file because
#: the baseline ref advances each round: without persistence the salt
#: change would be forgotten after one round with most greens unverified.
SALT_FILE = os.path.join(REPO, "VERIFY_SALT.json")


def baseline_ref() -> str:
    """The driver's latest `round N: verdict/...` commit: it snapshots
    exactly the bodies the last correctness run checked (the driver
    verifies after the round's final commit, then commits its own
    bookkeeping on top without touching package code)."""
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(r"round \d+: verdict", subject):
            return sha
    raise SystemExit("no `round N: verdict` baseline commit found")


def module_rel_path(dotted: str) -> str | None:
    """`pkg.operators.text` -> `pkg/operators/text.py` if it exists."""
    if not dotted.startswith(PKG):
        return None
    rel = dotted.replace(".", "/") + ".py"
    return rel if os.path.exists(os.path.join(REPO, rel)) else None


class ModuleIndex:
    """Per-module symbol tables from one source snapshot."""

    def __init__(self, source: str, rel_path: str):
        self.rel_path = rel_path
        self.functions: dict[str, ast.AST] = {}
        self.constants: dict[str, ast.AST] = {}
        #: local name -> dotted module it aliases (``import x`` forms)
        self.mod_aliases: dict[str, str] = {}
        #: local name -> (dotted module, original name) (``from m import x``)
        self.from_imports: dict[str, tuple[str, str]] = {}
        tree = ast.parse(source)
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                # classes count as callables: a changed Stream/Table
                # method must flag every query built on the class
                self.functions[node.name] = node
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        self.constants[t.id] = node
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                self.constants[node.target.id] = node
        # imports anywhere (module level AND inside function bodies)
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module:
                for a in node.names:
                    local = a.asname or a.name
                    sub = f"{node.module}.{a.name}"
                    if module_rel_path(sub):
                        self.mod_aliases[local] = sub  # from pkg.x import y(=module)
                    else:
                        self.from_imports[local] = (node.module, a.name)
            elif isinstance(node, ast.Import):
                for a in node.names:
                    local = a.asname or a.name.split(".")[0]
                    self.mod_aliases[local] = a.name


class Snapshot:
    """Lazy AST index over one code snapshot (worktree or a git ref)."""

    def __init__(self, ref: str | None):
        self.ref = ref
        self._modules: dict[str, ModuleIndex | None] = {}
        self._conf_salt: str | None = None

    def conf_salt(self) -> str:
        """Combined digest of the SALT_FUNCS' AST closures in this
        snapshot — the global salt folded into every query digest,
        covering the Spark conf block (get_spark) no query's closure
        can reach and the universal table loader (load_table) every
        query's closure deliberately stops at."""
        if self._conf_salt is None:
            parts = [
                self._closure_digest_unsalted(
                    SESSION_REL, fn, stop_at_salt=False
                )
                or "absent"
                for fn in SALT_FUNCS
            ]
            self._conf_salt = hashlib.sha256(
                "|".join(parts).encode()
            ).hexdigest()
        return self._conf_salt

    def module(self, rel_path: str) -> ModuleIndex | None:
        if rel_path not in self._modules:
            try:
                if self.ref is None:
                    with open(os.path.join(REPO, rel_path), encoding="utf-8") as fh:
                        src = fh.read()
                else:
                    src = subprocess.run(
                        ["git", "show", f"{self.ref}:{rel_path}"],
                        cwd=REPO, capture_output=True, text=True, check=True,
                    ).stdout
                self._modules[rel_path] = ModuleIndex(src, rel_path)
            except Exception:
                self._modules[rel_path] = None
        return self._modules[rel_path]

    def closure_digest(self, rel_path: str, func_name: str) -> str | None:
        """Salted digest: the function's own AST closure hashed together
        with the session conf salt, so a ``get_spark`` conf edit flips
        EVERY query to changed even though no query calls it."""
        body = self._closure_digest_unsalted(rel_path, func_name)
        if body is None:
            return None
        return hashlib.sha256(
            f"{body}|conf:{self.conf_salt()}".encode()
        ).hexdigest()

    def _closure_digest_unsalted(
        self, rel_path: str, func_name: str, stop_at_salt: bool = True
    ) -> str | None:
        """sha256 over the sorted ast.dump of the transitive closure of
        (functions + referenced module constants) reachable from one
        function.  None if the function does not exist in this
        snapshot.  With ``stop_at_salt`` (the default for per-query
        digests) the walk does not descend into the SALT_FUNCS — their
        bodies are covered by the global conf salt instead, so an edit
        there epochs the whole registry rather than overflowing the
        head (see the SALT_FUNCS comment)."""
        mod = self.module(rel_path)
        if mod is None or func_name not in mod.functions:
            return None
        pieces: dict[str, str] = {}
        seen: set[tuple[str, str]] = set()
        stack = [(rel_path, func_name)]
        while stack:
            mpath, fname = stack.pop()
            if (mpath, fname) in seen:
                continue
            if (
                stop_at_salt
                and mpath == SESSION_REL
                and fname in SALT_FUNCS
                and (mpath, fname) != (rel_path, func_name)
            ):
                continue
            seen.add((mpath, fname))
            m = self.module(mpath)
            if m is None or fname not in m.functions:
                continue
            node = m.functions[fname]
            pieces[f"{mpath}::{fname}"] = ast.dump(node)
            # names referenced by this function (plain + attribute bases)
            plain: set[str] = set()
            attrs: set[tuple[str, str]] = set()
            for sub in ast.walk(node):
                if isinstance(sub, ast.Name):
                    plain.add(sub.id)
                elif isinstance(sub, ast.Attribute) and isinstance(
                    sub.value, ast.Name
                ):
                    attrs.add((sub.value.id, sub.attr))
            for name in plain:
                if name in m.functions and name != fname:
                    stack.append((mpath, name))
                elif name in m.constants:
                    pieces[f"{mpath}::{name}"] = ast.dump(m.constants[name])
                elif name in m.from_imports:
                    src_mod, orig = m.from_imports[name]
                    rp = module_rel_path(src_mod)
                    if rp:
                        sm = self.module(rp)
                        if sm and orig in sm.functions:
                            stack.append((rp, orig))
                        elif sm and orig in sm.constants:
                            pieces[f"{rp}::{orig}"] = ast.dump(
                                sm.constants[orig]
                            )
            for base, attr in attrs:
                target = m.mod_aliases.get(base)
                rp = module_rel_path(target) if target else None
                if rp:
                    tm = self.module(rp)
                    if tm and attr in tm.functions:
                        stack.append((rp, attr))
                    elif tm and attr in tm.constants:
                        pieces[f"{rp}::{attr}"] = ast.dump(tm.constants[attr])
        blob = "\n".join(f"{k}\n{v}" for k, v in sorted(pieces.items()))
        return hashlib.sha256(blob.encode()).hexdigest()


def query_locations() -> dict[str, tuple[str, str]]:
    """name -> (module rel path, function name) from the live registry."""
    import inspect

    from confluent_kafka_streams_examples_spark.queries import QUERIES

    out = {}
    for name, fn in QUERIES.items():
        src = inspect.getsourcefile(fn)
        rel = os.path.relpath(src, REPO)
        out[name] = (rel, fn.__name__)
    return out


def latest_green_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path, encoding="utf-8") as fh:
            data = json.load(fh)
        for qname, res in data.items():
            ok = (
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match", True)
            )
            if ok:
                latest[qname] = max(latest.get(qname, 0), rnd)
            else:
                # a failed check invalidates older greens: rank 0 =
                # never-green, which forces the query into the head
                # even when its body is unchanged
                latest[qname] = 0
    return latest


#: operator-family classifier for the sentinel band (first match wins).
#: Families mirror SURVEY §2's operator groups so the band exercises
#: one of each per round — a conf-level behavioral regression (e.g. a
#: join-strategy or window-semantics change) then surfaces within ONE
#: round no matter which family it hits, instead of waiting for that
#: family's stalest member to rotate into the window.
_FAMILY_RULES: list[tuple[str, tuple[str, ...]]] = [
    ("ktable", ("ktable_",)),
    ("join", ("asof_join", "anti_join", "semi_join", "stream_stream",
              "stream_table")),
    ("window", ("windowed_", "user_sessions", "event_gaps",
                "rolling_user_stats", "user_running_value",
                "funnel_conversion", "user_retention")),
    ("dedup", ("dedup_", "neardup_", "doc_fingerprint", "doc_winnow",
               "boilerplate")),
    ("ann", ("similarity_", "semdedup_", "ann_", "pq_", "hybrid_search",
             "embedding_")),
    ("text", ("lang_", "text_stats", "token_", "lm_", "vocab_", "bpe_",
              "quality_", "ngram_", "bm25_", "top_terms")),
    ("curation", ("corpus_", "pipeline_", "pack_", "decontaminate",
                  "pii_", "duplicate_rate", "source_overlap",
                  "multimodal")),
    ("storage", ("zorder_", "merge_upsert", "scd2_", "bucketed_",
                 "sketch_", "skewed_", "events_concurrent", "sample_",
                 "pivot_", "rollup_", "cube_", "setops_", "distinct_",
                 "value_percentiles", "kafka_wire")),
    ("agg", ("agg_", "topk_", "events_json", "json_props",
             "basic_pipeline", "sql_interface", "forecast_")),
]


def family(name: str) -> str:
    for fam, prefixes in _FAMILY_RULES:
        if any(name.startswith(p) or name == p for p in prefixes):
            return fam
    return "analytics"  # TPC-H shapes and anything unmatched


def salt_epoch(cur_salt: str, update: bool = True) -> int:
    """The round from which the CURRENT conf salt is in effect.  Greens
    earlier than this were verified under a different Spark conf and
    rank as stale-0 for rotation (but NOT as head: a conf change
    invalidates the whole registry at once, which only the band
    rotation can re-verify soundly across rounds).  Persisted in
    VERIFY_SALT.json because the baseline ref advances every round —
    without the file the change would be forgotten after one round.
    When ``update`` and the salt differs from the stored one, a new
    epoch (= next round to be verified) is written."""
    stored: dict = {}
    try:
        with open(SALT_FILE, encoding="utf-8") as fh:
            stored = json.load(fh)
    except (OSError, ValueError):
        pass
    if stored.get("salt") == cur_salt:
        return int(stored.get("epoch_round", 0))
    next_round = 1 + max(
        [
            int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
            for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        ]
        or [0]
    )
    if update:
        with open(SALT_FILE, "w", encoding="utf-8") as fh:
            json.dump({"salt": cur_salt, "epoch_round": next_round}, fh)
            fh.write("\n")
        print(
            f"# conf salt changed -> new epoch r{next_round} written to "
            f"{os.path.basename(SALT_FILE)} (commit it); all greens "
            "older than the epoch now rotate as stale",
            file=sys.stderr,
        )
    return next_round


def epoch_freshness_violations(
    epoch: int,
    greens: dict[str, int],
    verified_rounds: set[int],
    n_queries: int,
    window: int = WINDOW,
) -> tuple[list[str], int]:
    """Epoch-cycle honesty check (VERDICT r10 #8): once the rounds
    verified at-or-after ``epoch`` could have covered the whole
    registry (ceil(n/window) rounds — the cycle), NO query may still
    carry only a pre-epoch green: its last verification ran under a
    different Spark conf.  Returns (violations, debt):

    - ``violations``: names whose latest green predates the epoch
      after the cycle completed — each is a conf-stale green passing
      as verified-current; must be empty.
    - ``debt``: while the cycle is still running, how many pre-epoch
      greens EXCEED the remaining window capacity — a positive debt
      means the rotation mathematically cannot finish the cycle on
      time; must be 0.
    """
    import math

    rounds_since = sum(1 for r in verified_rounds if r >= epoch)
    cycle = math.ceil(n_queries / window)
    pre = sorted(n for n, g in greens.items() if 0 < g < epoch)
    if rounds_since >= cycle:
        return pre, 0
    capacity = (cycle - rounds_since) * window
    return [], max(0, len(pre) - capacity)


def generate_order() -> tuple[list[str], list[str]]:
    """Returns (ordered names, head names).  Head = body-changed since
    the baseline snapshot or never green.  Conf-salt changes
    (session.py's get_spark) rank every pre-epoch green as stale-0 in
    the tail instead — see `salt_epoch`.  The band that fills the window
    after the head is STRATIFIED: round-robin across operator families
    (stalest family first), oldest green first within each family —
    diversity per round AND rotation progress per family.  Displaced
    names fall back to global oldest-green-first."""
    from confluent_kafka_streams_examples_spark.queries import QUERIES

    base = Snapshot(baseline_ref())
    cur = Snapshot(None)
    locs = query_locations()
    greens = latest_green_rounds()
    epoch = salt_epoch(cur.conf_salt())
    # pre-epoch greens were verified under a different Spark conf:
    # rotation-stale, oldest-first (rank 0 sorts before any real round)
    eff = {n: (g if g >= epoch else 0) for n, g in greens.items()}
    reg_order = {n: i for i, n in enumerate(QUERIES)}

    head, tail = [], []
    for name in QUERIES:
        rel, fname = locs[name]
        changed = cur._closure_digest_unsalted(
            rel, fname
        ) != base._closure_digest_unsalted(rel, fname)
        if changed or greens.get(name, 0) == 0:
            head.append(name)
        else:
            tail.append(name)
    head.sort(key=lambda n: reg_order[n])
    tail.sort(key=lambda n: (eff[n], reg_order[n]))
    greens = eff

    # stratified sentinel band (tail slice that fits the window)
    n_band = max(0, WINDOW - len(head))
    fams: dict[str, list[str]] = {}
    for n in tail:  # already staleness-sorted within each family
        fams.setdefault(family(n), []).append(n)
    fam_cycle = sorted(
        fams, key=lambda f: (greens[fams[f][0]], reg_order[fams[f][0]])
    )
    band: list[str] = []
    while len(band) < n_band and any(fams.values()):
        for f in fam_cycle:
            if fams[f] and len(band) < n_band:
                band.append(fams[f].pop(0))
    rest = [n for f in fam_cycle for n in fams[f]]
    rest.sort(key=lambda n: (greens[n], reg_order[n]))
    return head + band + rest, head


def main() -> None:
    order, head = generate_order()
    if len(head) > WINDOW:
        raise SystemExit(
            f"{len(head)} changed/never-green queries exceed the "
            f"{WINDOW}-entry verification window — the rotation protocol "
            "is unsound this round; split the changes across rounds"
        )
    if "--names" in sys.argv:
        print("\n".join(order))
        return
    displaced = order[WINDOW:]
    cur = Snapshot(None)
    print(f"# generated by scripts/gen_verify_order.py — head={len(head)} "
          f"changed/never-green, window={WINDOW}, "
          f"conf-salt={cur.conf_salt()[:8]} "
          f"epoch=r{salt_epoch(cur.conf_salt(), update=False)}")
    print("_VERIFY_FIRST = [")
    for i, name in enumerate(order):
        marker = ""
        if i == len(head) and head:
            marker = "    # --- tail: oldest green first ---\n"
        if i == WINDOW:
            marker += (
                "    # --- names below fall past the window: verified "
                "next round ---\n"
            )
        print(f"{marker}    \"{name}\",")
    print("]")
    print(f"# displaced ({len(displaced)}): {', '.join(displaced)}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
