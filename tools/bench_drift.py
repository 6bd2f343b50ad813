"""Drift-adjusted bench comparison: separate HOST drift from PLAN
regressions when comparing two bench artifacts.

The recurring failure mode of raw comparisons (seen in rounds 3, 4,
and 6): the whole host speeds up or slows down between runs, so every
query moves together and a naive per-query threshold flags dozens of
phantom regressions — or hides a real one inside a speedup. The
fixed-cost queries are the tell: when c6/c7-class sub-second queries
drift by the same factor as the heavy ones, that factor is the HOST,
not the plans.

Method: estimate the host factor as the MEDIAN ratio new/old over the
cheapest half of shared queries (cheap = lowest old-time; their work
is dominated by fixed per-job overhead, the purest host signal), then
flag queries whose ratio exceeds the host factor by more than
``--slack`` (default 1.25×) AND whose absolute delta exceeds
``--min-delta`` seconds (default 0.3 — sub-300ms noise is noise).

Usage:
    python tools/bench_drift.py OLD.json NEW.json [--slack 1.25]
        [--min-delta 0.3]

Exit code 1 if any drift-adjusted regression is flagged.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    argv = list(sys.argv[1:])
    slack = 1.25
    min_delta = 0.3
    if "--slack" in argv:
        i = argv.index("--slack")
        slack = float(argv[i + 1])
        del argv[i : i + 2]
    if "--min-delta" in argv:
        i = argv.index("--min-delta")
        min_delta = float(argv[i + 1])
        del argv[i : i + 2]
    if len(argv) != 2:
        print(__doc__)
        return 2
    old_art = json.load(open(argv[0]))
    new_art = json.load(open(argv[1]))
    old = old_art["queries"]
    new = new_art["queries"]
    shared = sorted(set(old) & set(new), key=lambda k: old[k])
    if len(shared) < 4:
        print(f"only {len(shared)} shared queries — not comparable")
        return 2

    def canary_medians(art: dict) -> dict | None:
        """Per-canary median of the start and end passes (each artifact
        brackets its main loop with the pinned canary subset)."""
        c = art.get("canary")
        if not c:
            return None
        start, end = c["start"], c["end"]
        both = set(start) & set(end)
        return {k: (start[k] + end[k]) / 2 for k in both}

    oc, nc = canary_medians(old_art), canary_medians(new_art)
    if oc and nc and set(oc) & set(nc):
        ck = sorted(set(oc) & set(nc))
        host = statistics.median(nc[k] / oc[k] for k in ck if oc[k] > 0)
        src = f"pinned canary subset ({len(ck)} queries, start/end medians)"
        for label, art in (("old", old_art), ("new", new_art)):
            c = art["canary"]
            intra = statistics.median(
                c["end"][k] / c["start"][k]
                for k in set(c["start"]) & set(c["end"])
                if c["start"][k] > 0
            )
            print(
                f"{label} artifact intra-run drift (end/start over "
                f"canaries): {intra:.3f}"
            )
    else:
        # legacy artifacts: cheapest-half heuristic (fixed per-job
        # overhead dominates the cheap queries, the purest host signal)
        cheap = shared[: max(2, len(shared) // 2)]
        host = statistics.median(
            new[k] / old[k] for k in cheap if old[k] > 0
        )
        src = f"median new/old over the {len(cheap)} cheapest shared"
    print(
        f"shared {len(shared)} queries; host factor {host:.3f} "
        f"({src}; >1 = this host is slower)"
    )
    if new_art.get("canary_vs_prev_round") is not None:
        print(
            f"new artifact self-published canary_vs_prev_round="
            f"{new_art['canary_vs_prev_round']} (vs "
            f"{new_art.get('canary_prev_artifact')}); this "
            f"comparison's factor {host:.3f}"
        )
    flagged = []
    for k in shared:
        if old[k] <= 0:
            continue
        ratio = new[k] / old[k]
        adj = ratio / host
        if adj > slack and (new[k] - host * old[k]) > min_delta:
            flagged.append((k, old[k], new[k], ratio, adj))
    if flagged:
        print(f"\n{len(flagged)} drift-adjusted regression(s):")
        for k, o, n, r, a in sorted(
            flagged, key=lambda f: -f[4]
        ):
            print(
                f"  {k}: {o:.2f}s -> {n:.2f}s "
                f"(raw {r:.2f}x, host-adjusted {a:.2f}x)"
            )
    else:
        print("no drift-adjusted regressions")
    only_new = sorted(set(new) - set(old))
    if only_new:
        total = sum(new[k] for k in only_new)
        print(
            f"\n{len(only_new)} new quer(ies) add {total:.1f}s "
            f"of tracked coverage: {', '.join(only_new)}"
        )
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
