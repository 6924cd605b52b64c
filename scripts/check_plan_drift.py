#!/usr/bin/env python3
"""Plan-drift gate: diff two plan-fingerprint files and emit the list of
queries whose executed plan changed — exactly the set that needs an sf1
oracle re-verify before "registry-wide sf1 holds by composition" can be
claimed for the round.

Workflow (the round-N sf1 protocol):
    sbt "runMain graft.Explain /root/testdata/sf0.001 /tmp/plan_fps.tsv --fingerprint"
    python3 scripts/check_plan_drift.py PLAN_FPS.tsv /tmp/plan_fps.tsv
      -> prints NEW/CHANGED/REMOVED queries + a comma list for Verify
    sbt "runMain graft.Verify /tmp/sf1 /tmp/verify_sf1 <comma-list>"
    python3 scripts/check_oracle_timeout.py /tmp/sf1 /tmp/verify_sf1 900
    python3 scripts/check_plan_drift.py PLAN_FPS.tsv /tmp/plan_fps.tsv --update --force
      -> ONLY after the sf1 sweep is green: promote the fresh file to
         baseline. --update alone refuses while drift is present, so a
         premature promote can't launder unverified plan changes.

Exit status: 0 if no drift, 1 if any query is new/changed/removed (so a
round script can gate on it), 2 on usage errors.
"""
import sys


def load(path):
    fps = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            name, _, fp = line.partition("\t")
            if not fp:
                sys.exit(f"malformed fingerprint line in {path}: {line!r}")
            fps[name] = fp
    if not fps:
        sys.exit(f"{path}: zero fingerprint entries — wrong file?")
    return fps


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update" in sys.argv
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    base_path, cur_path = args
    base, cur = load(base_path), load(cur_path)

    failed = sorted(n for n, fp in cur.items() if fp.startswith("FAILED:"))
    new = sorted(set(cur) - set(base))
    removed = sorted(set(base) - set(cur))
    changed = sorted(n for n in set(base) & set(cur) if base[n] != cur[n])

    for label, names in (("FAILED", failed), ("NEW", new),
                         ("REMOVED", removed), ("CHANGED", changed)):
        for n in names:
            print(f"{label} {n}")
    need = sorted(set(new) | set(changed))
    if failed:
        print(f"== {len(failed)} queries FAILED to plan — fix before gating ==")
        sys.exit(1)
    if need:
        print(f"== {len(need)} queries need an sf1 re-verify ==")
        print(",".join(need))
    else:
        print("== no plan drift: registry-wide sf1 holds by composition ==")
    if update:
        # Promoting a baseline that still shows drift would launder
        # unverified plan changes: --update is only legal once the sf1
        # re-verify of the changed set is green, which a caller asserts
        # with --force.
        if (need or removed) and "--force" not in sys.argv:
            print("[update] REFUSED: drift present — run the sf1 re-verify "
                  "of the changed set first, then pass --force to promote")
            sys.exit(1)
        with open(base_path, "w") as f:
            for n in sorted(cur):
                f.write(f"{n}\t{cur[n]}\n")
        print(f"[update] baseline {base_path} <- {cur_path}")
    sys.exit(1 if (need or removed) else 0)


if __name__ == "__main__":
    main()
