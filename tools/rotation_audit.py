"""Recompute the driver's correctness window FROM load_all() ORDER.

The driver samples the FIRST 50 ``load_all()`` entries each round; the
round-12 notes computed the window by hand-arithmetic over the rotation
plan and were wrong by three names (r13 verdict finding: three r8-stale
names fell past slot 50 silently).  This tool prints the ACTUAL window —
the ground truth the plan must match — plus the staleness histogram over
the whole registry, so the round notes quote a computation, not a claim.

Run:  python tools/rotation_audit.py [window_size]
"""

from __future__ import annotations

import sys
from collections import Counter


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from kioss_spark import queries

    names = list(queries.load_all())
    last = queries._LAST_GREEN_ROUND
    print(f"registry: {len(names)} queries; window = first {window}")
    print("\n-- window (driver will check these this round) --")
    for i, n in enumerate(names[:window]):
        tag = f"r{last[n]}" if n in last else "NEW"
        print(f"{i + 1:3d}. {n}  [{tag}]")
    hist = Counter(
        f"r{last[n]}" if n in last else "never" for n in names
    )
    print("\n-- staleness histogram (whole registry, pre-round) --")
    for k in sorted(hist, key=lambda s: (s != "never", s)):
        print(f"  {k}: {hist[k]}")
    post = Counter()
    for i, n in enumerate(names):
        if i < window:
            post["window(->this round)"] += 1
        else:
            post[f"r{last[n]}" if n in last else "never"] += 1
    print("\n-- post-round histogram IF the window goes green --")
    for k in sorted(post, key=lambda s: (s != "never", s)):
        print(f"  {k}: {post[k]}")
    stale_out = [
        n for n in names[window:] if n not in last
    ]
    if stale_out:
        print(f"\nWARNING: {len(stale_out)} never-checked names OUTSIDE "
              f"the window: {stale_out}")


if __name__ == "__main__":
    main()
