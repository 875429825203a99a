"""Driver-window rotation scheduler (VERDICT r7 items 1/2/5).

The correctness driver checks the first ~50 registry queries per round
(``CORRECTNESS_r{N}.json``). With 200+ oracle-able queries, who sits in
that window is a scheduling problem: every oracle-able query must be
re-attested often enough that its last driver-green row never goes
stale, and oracle-less queries (approximate/RNG/hash-bit by nature)
must never burn a slot — a driver row for them can only ever read
``err: no_oracle`` (r3 and r7 showed exactly that).

This module derives the schedule mechanically from the committed
artifacts instead of hand-curated lists:

- ``attestation_history()`` reads every ``CORRECTNESS_r*.json`` and
  records, per query, the rounds with a fully green (hash_match) row.
- ``compute_window(cap)`` is the greedy oldest-first policy: oracle-able
  never-attested queries first, then ascending last-green round,
  ties broken by stable registry base order. Oracle-less queries are
  excluded permanently (``excluded_from_window()``).
- ``staleness_table()`` renders the published query → last-green-round
  table (ROTATION.md) with the upcoming window marked.

``registry._FRONT_QUERIES`` stays a static literal so importing the
package never depends on artifact files, but
``tests/test_entry_contract.py::test_front_load_is_the_generated_rotation``
pins it equal to the window computed from the artifacts that existed at
generation time — regenerate with::

    python tools/rotation.py --write   # rewrites ROTATION.md, prints list

Close-tolerance (VERDICT r8 #1): the driver drops CORRECTNESS_r{N}.json
AFTER the builder's closing suite runs, so a freshness pin that compares
against ALL artifacts goes red by construction every time a round closes.
ROTATION.md therefore records the round it was generated from
(``generation_round()`` parses it back), every computation accepts
``through=<round>`` to ignore newer artifacts, and the pins compare
against the recorded generation round while allowing at most ONE
newer artifact on disk (the just-closed round, awaiting regeneration).

Rotation math: the oracle-able count is computed from the live registry
(see ROTATION.md for the current figure); with a 50-row cap the
steady-state staleness bound is ceil(oracle_able / 50) rounds and the
greedy policy attains it (test_staleness_bound_holds_after_planned_window).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CAP = 50  # observed driver window size (CORRECTNESS_r0{3..7}.json all have 50 rows)

# Queries whose implementation changed MATERIALLY after their last
# driver attestation: a green row from a round <= the listed round was
# produced by the old code and no longer attests the current query, so
# the scheduler ignores it — the query regains never-attested (front)
# priority until a newer driver row lands, at which point the entry is
# inert (rounds above the cut pass through) and can be deleted.
REATTEST: dict[str, int] = {
    # (empty — r13: x20's r12 driver row attests the current
    # implementation, so its r11 cut became inert and was deleted;
    # add entries here whenever an implementation changes materially
    # after its last driver green)
}


def attestation_history(
    repo: str = REPO, through: int | None = None
) -> dict[str, list[int]]:
    """query -> sorted rounds with a fully green driver row.

    ``through`` ignores artifacts newer than that round, so the window
    a past generation produced stays reproducible after new artifacts
    land (close-tolerance, VERDICT r8 #1). Rows at or before a query's
    ``REATTEST`` cut are dropped — they attest a superseded
    implementation."""
    hist: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        if through is not None and rnd > through:
            continue
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if rnd <= REATTEST.get(name, 0):
                continue
            if (
                row.get("hash_match") is True
                and row.get("rows_match") is True
                and row.get("schema_match") is True
            ):
                hist.setdefault(name, []).append(rnd)
    return {n: sorted(rs) for n, rs in hist.items()}


def latest_round(repo: str = REPO, through: int | None = None) -> int:
    rounds = [
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    ]
    if through is not None:
        rounds = [r for r in rounds if r <= through]
    return max(rounds) if rounds else 0


_GENERATED_RE = re.compile(r"Generated from artifacts through round (\d+)")


def generation_round(repo: str = REPO) -> int | None:
    """Parse the round ROTATION.md was generated from (None if the file
    is missing or predates the marker)."""
    path = os.path.join(repo, "ROTATION.md")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        m = _GENERATED_RE.search(f.read())
    return int(m.group(1)) if m else None


def _registry():
    sys.path.insert(0, REPO)
    from etl_project_spark import registry

    registry._ensure_loaded()
    return registry


def base_order(registry=None) -> list[str]:
    """Stable registry order independent of the current front list:
    (module rank, within-module registration order). Used as the
    greedy tie-break so regenerating the window is reproducible."""
    reg = registry or _registry()
    rank = {m: i for i, m in enumerate(reg._MODULE_ORDER)}
    seq = {name: i for i, name in enumerate(reg._REGISTRY)}
    return sorted(
        reg._REGISTRY,
        key=lambda n: (rank.get(reg._SOURCE_MODULE[n], len(rank)), seq[n]),
    )


def excluded_from_window(registry=None) -> set[str]:
    """Oracle-less queries: permanently out of the driver window.
    Their evidence is the rtol compare / recall measurement every local
    sweep runs plus deterministic hash-green twins (x6/dd5c/x14/x15,
    a12/a13/a14)."""
    reg = registry or _registry()
    return {n for n, spec in reg._REGISTRY.items() if spec.oracle is None}


def compute_window(
    cap: int = CAP, repo: str = REPO, through: int | None = None
) -> list[str]:
    """Greedy oldest-first window: never-attested oracle-able queries
    first (base order), then ascending last-green round (base order
    tie-break), truncated to ``cap``."""
    reg = _registry()
    hist = attestation_history(repo, through)
    excluded = excluded_from_window(reg)
    order = [n for n in base_order(reg) if n not in excluded]
    pos = {n: i for i, n in enumerate(order)}
    ranked = sorted(order, key=lambda n: (max(hist.get(n, [0])), pos[n]))
    return ranked[:cap]


def staleness(repo: str = REPO, through: int | None = None) -> dict[str, int]:
    """query -> rounds since last driver-green row, as of the latest
    recorded round (never-attested = latest_round, i.e. 'all of them')."""
    hist = attestation_history(repo, through)
    latest = latest_round(repo, through)
    reg = _registry()
    excluded = excluded_from_window(reg)
    return {
        n: latest - max(hist.get(n, [0])) if hist.get(n) else latest
        for n in base_order(reg)
        if n not in excluded
    }


def staleness_table(repo: str = REPO, through: int | None = None) -> str:
    reg = _registry()
    hist = attestation_history(repo, through)
    latest = latest_round(repo, through)
    excluded = excluded_from_window(reg)
    window = set(compute_window(CAP, repo, through))
    lines = [
        "# ROTATION — driver-window schedule and attestation staleness",
        "",
        "Generated by `python tools/rotation.py --write` from the committed",
        f"`CORRECTNESS_r*.json` artifacts. Generated from artifacts through "
        f"round {latest} (the freshness pins in test_entry_contract.py parse "
        "this marker and tolerate at most one newer artifact on disk). The",
        f"driver checks the first {CAP} registry queries per round; the",
        "window below is the greedy oldest-first schedule",
        "(`tools/rotation.py:compute_window`), pinned equal to",
        "`registry._FRONT_QUERIES` by",
        "`tests/test_entry_contract.py::test_front_load_is_the_generated_rotation`.",
        "",
        f"- oracle-able queries: {len(base_order(reg)) - len(excluded)}",
        f"- permanently window-excluded (oracle-less by nature): "
        f"{len(excluded)} — {', '.join(sorted(excluded))}",
        f"- rotation period: ceil(oracle-able / {CAP}) = "
        f"{-(-(len(base_order(reg)) - len(excluded)) // CAP)} rounds "
        "(the provable steady-state staleness bound)",
    ]
    if REATTEST:
        lines.append(
            "- re-attestation pending (implementation changed after last "
            "driver green; old rows ignored): "
            + ", ".join(
                f"{n} (through r{r})" for n, r in sorted(REATTEST.items())
            )
        )
    lines += [
        "",
        "| query | last driver-green | staleness (rounds) | in next window |",
        "|---|---|---|---|",
    ]
    rows = []
    for n in base_order(reg):
        if n in excluded:
            continue
        last = max(hist[n]) if hist.get(n) else None
        stale = latest - last if last else latest
        rows.append((stale, n, last))
    rows.sort(key=lambda t: (-t[0], t[1]))
    for stale, n, last in rows:
        lines.append(
            f"| {n} | {'r' + str(last) if last else 'never'} | {stale} | "
            f"{'yes' if n in window else ''} |"
        )
    lines.append("")
    lines.append(
        "Oracle-less queries (excluded above) are checked every local sweep "
        "via approx_oracle/rtol or recall measurement (RECALL.json) and each "
        "has a deterministic hash-green twin in the registry — see "
        "registry.py and VERDICT r6/r7."
    )
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    write = "--write" in sys.argv
    window = compute_window()
    table = staleness_table()
    if write:
        with open(os.path.join(REPO, "ROTATION.md"), "w") as f:
            f.write(table)
        print(f"wrote ROTATION.md ({len(table.splitlines())} lines)")
    print("# generated _FRONT_QUERIES (paste into registry.py):")
    print("_FRONT_QUERIES = [")
    for n in window:
        print(f'    "{n}",')
    print("]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
