#!/usr/bin/env python3
"""Diff two PLANAUDIT_r{N}.json artifacts and fail loudly on plan-shape
regressions — the close-out check that a round's code changes did not
silently cost a pushdown, add an exchange, lose a bucket selection or
shrink a codegen span on any gate key.

Usage:
  python3 tools/planaudit_diff.py PLANAUDIT_r15.json PLANAUDIT_r16.json [acked]

`acked` is a comma-separated list of keys whose shape CHANGED ON PURPOSE
this round (new operators landing, an intentional plan change); their
diffs print as acknowledged instead of failing. New keys (absent from
the old artifact) are reported informationally. Exit 1 iff any
unacknowledged regression remains.
"""
import json
import sys


REGRESSION_RULES = [
    # (label, is_worse(old_value, new_value))
    ("shuffles", lambda o, n: n > o),            # new exchange
    ("broadcasts", lambda o, n: n < o),          # lost broadcast (likely now a shuffle)
    ("scans_with_pushdown", lambda o, n: n < o), # lost parquet pushdown
    ("scans_with_partition_filter", lambda o, n: n < o),  # lost partition pruning
    ("codegen_spans", lambda o, n: n < o),       # a span fell out of codegen
    ("max_fused", lambda o, n: n < o),           # the widest span shrank
]


def bucket_regressed(old, new):
    """Lost bucket selection: fewer pruned-bucket scans, or a scan that
    used to select a strict subset now reads all buckets."""
    def pruned(sels):
        out = []
        for s in sels:
            parts = s.split(" out of ")
            if len(parts) == 2 and int(parts[0]) < int(parts[1]):
                out.append(s)
        return out
    return len(pruned(new.get("selected_buckets", []))) < len(pruned(old.get("selected_buckets", [])))


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    acked_keys = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and sys.argv[3] else set()

    regressions, acked, fresh = [], [], []
    for key in sorted(new):
        if key not in old:
            fresh.append(key)
            continue
        o, n = old[key], new[key]
        problems = [f"{label} {o[label]} -> {n[label]}"
                    for label, worse in REGRESSION_RULES if worse(o[label], n[label])]
        if bucket_regressed(o, n):
            problems.append(f"bucket selection {o['selected_buckets']} -> {n['selected_buckets']}")
        if problems:
            (acked if key in acked_keys else regressions).append((key, problems))

    gone = sorted(set(old) - set(new))
    for key in fresh:
        print(f"[new]    {key} (no prior shape to compare)")
    for key in gone:
        print(f"[gone]   {key} (was in the old artifact)")
    for key, problems in acked:
        print(f"[acked]  {key}: {'; '.join(problems)}")
    for key, problems in regressions:
        print(f"[REGRESSION] {key}: {'; '.join(problems)}")
    print(f"[planaudit-diff] {len(new)} keys: {len(regressions)} regression(s), "
          f"{len(acked)} acknowledged, {len(fresh)} new, {len(gone)} gone")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
